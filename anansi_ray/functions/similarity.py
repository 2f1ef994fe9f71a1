"""Similarity search over an embedding column (``list<float>``).

* ``knn_brute``  — exact cosine top-k: numpy matmul per batch against a
  broadcast query matrix (``ray.put`` once, read per task), per-batch
  partial top-k, final merge via ``groupby(query_id).map_groups``.  This is
  the oracle-checkable baseline.
* ``IvfIndex``   — the scale path: seeded Lloyd k-means (numpy, driver-side
  over a bounded sample), centroid broadcast, cell assignment as a
  ``map_batches`` pass, search restricted to the ``n_probe`` nearest cells.

Scale notes: brute force streams the corpus once per query *batch* (queries
are the broadcast side, the corpus never materializes on one node); IVF
turns that into a partition-pruned scan — both shapes survive 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _mat(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    # Arrow flatten + reshape: no per-row Python list materialization
    flat = (
        batch[col]
        .combine_chunks()
        .flatten()
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    m = flat.reshape(batch.num_rows, -1)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _ids(batch: pa.Table, id_col: str) -> np.ndarray:
    return batch[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)


def knn_brute(
    ds: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k of every corpus vector for each query (self
    excluded).  Returns (query_id, rank, vec_id, cosine) sorted by
    (query_id, rank); ties broken by vec_id ascending; cosine rounded to 6
    decimals for stable cross-engine comparison."""
    q_arr = pa.array([int(q) for q in query_ids], pa.int64())
    q_tbl = ds.map_batches(
        lambda b: b.filter(pc.is_in(pc.cast(b[id_col], pa.int64()), value_set=q_arr)),
        batch_format="pyarrow",
    ).to_pandas()
    if len(q_tbl) == 0:
        # empty corpus (or no query id present): nothing to rank
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    q_tbl = q_tbl.sort_values(id_col)
    q_ids = q_tbl[id_col].to_numpy(dtype=np.int64)
    q_mat = np.asarray(list(q_tbl["embedding"]), dtype=np.float64)
    q_mat = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put((q_ids, q_mat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        ids = _ids(batch, id_col)
        mat = _mat(batch)
        sims = qm @ mat.T  # (Q, B)
        out_q, out_v, out_c = [], [], []
        kk = min(k, sims.shape[1])
        for qi_idx in range(len(qi)):
            row = sims[qi_idx]
            mask = ids != qi[qi_idx]
            cand_idx = np.flatnonzero(mask)
            if len(cand_idx) == 0:
                continue
            row = row[cand_idx]
            # partial top-k within the batch (combiner before the shuffle)
            top = cand_idx[np.argsort(-row, kind="stable")[:kk]]
            out_q.extend([int(qi[qi_idx])] * len(top))
            out_v.extend(int(ids[t]) for t in top)
            out_c.extend(float(sims[qi_idx, t]) for t in top)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        cos = group["cosine"].combine_chunks().to_numpy(zero_copy_only=False)
        vid = _ids(group, "vec_id")
        order = np.lexsort((vid, -cos))[:k]
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(order)),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "vec_id": pa.array(vid[order], pa.int64()),
                "cosine": pa.array(np.round(cos[order], 6), pa.float64()),
            }
        )

    out = (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
        .to_pandas()
    )
    out = out.sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(out, preserve_index=False)


class IvfIndex:
    """IVF (inverted-file) approximate nearest neighbor index.

    ``build``: seeded numpy k-means over a bounded driver-side sample →
    centroids broadcast → one ``map_batches`` pass assigns every vector to
    its nearest cell (the assignment Dataset is the index).
    ``search``: compare queries only against vectors in the ``n_probe``
    nearest cells — a partition-pruned scan instead of a full pass.
    """

    def __init__(self, n_cells: int = 16, n_iter: int = 10, seed: int = 42):
        self.n_cells = n_cells
        self.n_iter = n_iter
        self.seed = seed
        self.centroids: np.ndarray | None = None
        self.assigned: rd.Dataset | None = None

    def build(self, ds: rd.Dataset, id_col: str = "vec_id", sample_limit: int = 100_000):
        sample = ds.limit(sample_limit).to_pandas()
        if len(sample) == 0:
            # empty corpus: no cells to train; search() returns empty
            self.centroids = np.zeros((0, 1))
            self.assigned = ds.materialize()
            return self
        mat = np.asarray(list(sample["embedding"]), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        rng = np.random.default_rng(self.seed)
        k = min(self.n_cells, len(mat))
        cent = mat[rng.choice(len(mat), k, replace=False)]
        for _ in range(self.n_iter):
            assign = np.argmax(mat @ cent.T, axis=1)
            for c in range(k):
                members = mat[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    cent[c] = v / max(np.linalg.norm(v), 1e-12)
        self.centroids = cent
        cent_ref = ray.put(cent)

        def assign_batch(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = _mat(batch)
            cell = np.argmax(m @ c.T, axis=1).astype(np.int32)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "embedding": batch["embedding"],
                    "cell": pa.array(cell, pa.int32()),
                }
            )

        self.assigned = ds.map_batches(assign_batch, batch_format="pyarrow").materialize()
        return self

    def search(
        self, query_ids: list[int], k: int = 10, n_probe: int = 4, id_col: str = "vec_id"
    ) -> pa.Table:
        assert self.assigned is not None and self.centroids is not None
        q_arr = pa.array([int(q) for q in query_ids], pa.int64())
        q_df = self.assigned.map_batches(
            lambda b: b.filter(
                pc.is_in(pc.cast(b[id_col], pa.int64()), value_set=q_arr)
            ),
            batch_format="pyarrow",
        ).to_pandas()
        if len(q_df) == 0 or len(self.centroids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        q_df = q_df.sort_values(id_col)
        q_ids = q_df[id_col].to_numpy(dtype=np.int64)
        q_mat = np.asarray(list(q_df["embedding"]), dtype=np.float64)
        q_mat = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
        probes = np.argsort(-(q_mat @ self.centroids.T), axis=1)[:, :n_probe]
        wanted_cells = set(int(c) for c in probes.ravel())
        q_ref = ray.put((q_ids, q_mat, probes))

        def scan(batch: pa.Table) -> pa.Table:
            qi, qm, pr = ray.get(q_ref)
            cells = (
                batch["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            ).astype(np.int32)
            keep = np.isin(cells, list(wanted_cells))
            if not keep.any():
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "cosine": pa.array([], pa.float64()),
                    }
                )
            ids = _ids(batch, id_col)[keep]
            mat = _mat(batch)[keep]
            cells = cells[keep]
            sims = qm @ mat.T
            out_q, out_v, out_c = [], [], []
            for i in range(len(qi)):
                cell_ok = np.isin(cells, pr[i])
                cand = np.flatnonzero(cell_ok & (ids != qi[i]))
                if len(cand) == 0:
                    continue
                top = cand[np.argsort(-sims[i, cand], kind="stable")[: min(k, len(cand))]]
                out_q.extend([int(qi[i])] * len(top))
                out_v.extend(int(v) for v in ids[top])
                out_c.extend(float(c) for c in sims[i, top])
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "cosine": pa.array(out_c, pa.float64()),
                }
            )

        def final_topk(group: pa.Table) -> pa.Table:
            cos = group["cosine"].combine_chunks().to_numpy(zero_copy_only=False)
            vid = _ids(group, "vec_id")
            order = np.lexsort((vid, -cos))[:k]
            return pa.table(
                {
                    "query_id": group["query_id"].take(pa.array(order)),
                    "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                    "vec_id": pa.array(vid[order], pa.int64()),
                    "cosine": pa.array(np.round(cos[order], 6), pa.float64()),
                }
            )

        from anansi_ray.arrowds import stable_frame

        out = stable_frame(
            self.assigned.map_batches(scan, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(final_topk, batch_format="pyarrow")
            .to_pandas(),
            {
                "query_id": "int64",
                "rank": "int64",
                "vec_id": "int64",
                "cosine": "float64",
            },
        )
        out = out.sort_values(["query_id", "rank"])
        return pa.Table.from_pandas(out, preserve_index=False)
