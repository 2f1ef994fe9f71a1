"""Distributed k-means over an embedding column.

The canonical iterative-algorithm shape on Ray Data: centroids are tiny
shared state broadcast once per iteration (``ray.put``); each batch
reduces itself to a ``k x (dim + 1)`` partial (per-centroid coordinate
sums + counts) BEFORE anything reaches the driver, so per-iteration
driver traffic is O(k * dim * n_blocks) regardless of corpus size; the
corpus itself is materialized once and never shuffles.

Determinism contract (what makes a full value oracle possible — the
single-threaded ``kmeans_local`` twin must reproduce the distributed
assignment bit-for-bit):

* init: centroids = the embeddings of the k smallest ids.
* distance: the broadcast-subtract form ``((x - c)**2).sum(-1)`` — the
  per-row reduction tree depends only on ``dim``, so a row's distances
  are identical whatever batch it lands in (a BLAS matmul would NOT
  guarantee this: its blocking changes with matrix shape).
* assignment: ``argmin`` (ties -> lowest centroid index).
* update: mean in float64, then ROUND to ``KM_ROUND`` decimals before
  the next iteration.  Partial sums are associative only up to float
  error (~1e-12 relative); the rounding grid (1e-6) absorbs that drift
  so both twins enter every iteration with identical centroids.
* empty cluster: keeps its previous (rounded) centroid.
* fixed iteration count (no float-compared convergence test).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

KM_K = 8
KM_ITERS = 5
KM_ROUND = 6


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch[emb_col].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def _assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    return d.argmin(axis=1)


def _update(
    sums: np.ndarray, counts: np.ndarray, prev: np.ndarray
) -> np.ndarray:
    C = prev.copy()
    nz = counts > 0
    C[nz] = sums[nz] / counts[nz, None]
    return np.round(C, KM_ROUND)


def _init_centroids(ids: np.ndarray, X: np.ndarray, k: int) -> np.ndarray:
    order = np.argsort(ids, kind="stable")[:k]
    return np.round(X[order], KM_ROUND)


def kmeans_local(
    tbl: pa.Table, id_col: str = "vec_id", emb_col: str = "embedding",
    k: int = KM_K, iters: int = KM_ITERS,
) -> pa.Table:
    """Single-threaded numpy twin (the oracle side): same per-record math,
    fully sequential orchestration."""
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    if len(ids) == 0:
        # empty in, empty out (same contract as the distributed path)
        return pa.table(
            {id_col: pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
        )
    # fewer rows than k: every row is its own centroid (same clamp as the
    # distributed path, so the twins stay bit-identical)
    k = min(k, len(ids))
    X = _emb_matrix(tbl, emb_col)
    C = _init_centroids(ids, X, k)
    for _ in range(iters):
        a = _assign(X, C)
        sums = np.zeros((k, X.shape[1]))
        np.add.at(sums, a, X)
        counts = np.bincount(a, minlength=k).astype(np.float64)
        C = _update(sums, counts, C)
    a = _assign(X, C)
    return pa.table(
        {id_col: pa.array(ids, pa.int64()), "cluster": pa.array(a, pa.int64())}
    )


def _latest_km_checkpoint(checkpoint_dir: str):
    """Most recent committed centroid checkpoint ``(iter, path)`` or
    ``None`` — single-file npz per superstep, committed via atomic
    tmp+rename (the same contract as pagerank's superstep checkpoints);
    in-flight ``*.tmp-*`` writers are ignored."""
    import os

    if not os.path.isdir(checkpoint_dir):
        return None
    best = None
    for name in os.listdir(checkpoint_dir):
        if not (name.startswith("iter_") and name.endswith(".npz")):
            continue
        if ".tmp-" in name:
            continue
        it = int(name[len("iter_") : -len(".npz")])
        if best is None or it > best[0]:
            best = (it, os.path.join(checkpoint_dir, name))
    return best


def kmeans_fit(
    ds: rd.Dataset, id_col: str = "vec_id", emb_col: str = "embedding",
    k: int = KM_K, iters: int = KM_ITERS,
    checkpoint_dir: "str | None" = None,
    resume: bool = False,
    stop_after: "int | None" = None,
):
    """Centroid training only (the iterative partial-sum loop shared by
    ``kmeans_distributed`` and the SemDeDup pipeline).  ``ds`` must be
    materialized by the caller.  Returns ``None`` on an empty corpus,
    else the rounded ``k_eff x dim`` float64 centroid matrix.

    With ``checkpoint_dir`` each superstep's ROUNDED centroid matrix (the
    entire iteration-variant state, k×dim floats) commits atomically;
    ``resume=True`` restarts from the latest committed superstep — the
    rounding contract makes the resumed run bit-equal to an uninterrupted
    one.  ``stop_after=k`` simulates a kill (returns ``None``)."""
    import os as _os

    start_iter = 0
    C = None
    if checkpoint_dir is not None and resume:
        latest = _latest_km_checkpoint(checkpoint_dir)
        if latest is not None:
            it, path = latest
            C = np.load(path)["C"]
            k = C.shape[0]
            start_iter = it + 1
    if C is None:
        C = _kmeans_seed(ds, id_col, emb_col, k)
        if C is None:
            return None
        k = C.shape[0]

    for i in range(start_iter, iters):
        C = _kmeans_superstep(ds, emb_col, C, k)
        if checkpoint_dir is not None:
            _os.makedirs(checkpoint_dir, exist_ok=True)
            final = _os.path.join(checkpoint_dir, f"iter_{i:04d}.npz")
            tmp = f"{final}.tmp-{_os.getpid()}"
            np.savez(tmp, C=C)
            # np.savez appends .npz to names without it; tmp ends .tmp-PID
            saved = tmp if _os.path.exists(tmp) else tmp + ".npz"
            _os.replace(saved, final)
            prev = _os.path.join(checkpoint_dir, f"iter_{i - 1:04d}.npz")
            if i > 0 and _os.path.exists(prev):
                _os.remove(prev)
        if stop_after is not None and i + 1 >= stop_after and i + 1 < iters:
            return None  # simulated kill between supersteps
    return C


def _kmeans_seed(ds: rd.Dataset, id_col: str, emb_col: str, k: int):
    """Deterministic init (k smallest ids) — split out so a resumed fit
    can skip it entirely."""
    # deterministic init: k smallest ids — per-block partial min-k, then a
    # tiny driver merge (no sort/shuffle of the corpus)
    def init_partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        X = _emb_matrix(batch, emb_col)
        order = np.argsort(ids, kind="stable")[:k]
        return pa.table(
            {
                "id": pa.array(ids[order], pa.int64()),
                "emb": pa.array(list(X[order]), pa.list_(pa.float64())),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(init_partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return None
    seed = pa.concat_tables(parts)
    sids = seed["id"].to_numpy(zero_copy_only=False)
    # same fewer-rows-than-k clamp as kmeans_local (the seed table holds
    # min(k, block_rows) ids per block, so its size bounds the corpus size
    # only when the corpus is smaller than k — exactly the clamp case)
    k = min(k, len(sids))
    semb = np.stack(
        [np.asarray(e, dtype=np.float64) for e in seed["emb"].to_pylist()]
    )
    return _init_centroids(sids, semb, k)


def _kmeans_superstep(ds: rd.Dataset, emb_col: str, C, k: int):
    """ONE partial-sum superstep: per-block assign + (sum, count) partials
    → driver merge of O(blocks) k×dim tables → rounded centroid update."""
    cref = ray.put(C)

    def partial(batch: pa.Table) -> pa.Table:
        Cc = ray.get(cref)
        X = _emb_matrix(batch, emb_col)
        a = _assign(X, Cc)
        sums = np.zeros((k, X.shape[1]))
        np.add.at(sums, a, X)
        counts = np.bincount(a, minlength=k).astype(np.float64)
        return pa.table(
            {
                "c": pa.array(np.arange(k), pa.int64()),
                "n": pa.array(counts, pa.float64()),
                "s": pa.array(list(sums), pa.list_(pa.float64())),
            }
        )

    ptabs = [
        t
        for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    sums = np.zeros((k, C.shape[1]))
    counts = np.zeros(k)
    for t in ptabs:
        counts += t["n"].to_numpy(zero_copy_only=False)
        sums += np.stack(
            [np.asarray(e, dtype=np.float64) for e in t["s"].to_pylist()]
        )
    C = _update(sums, counts, C)
    return C


def kmeans_distributed(
    ds: rd.Dataset, id_col: str = "vec_id", emb_col: str = "embedding",
    k: int = KM_K, iters: int = KM_ITERS,
) -> pa.Table:
    """Ray path: per-batch partial (sums, counts) combiner each iteration;
    the driver only ever sees k x (dim+1) partials per block."""
    ds = ds.materialize()
    C = kmeans_fit(ds, id_col, emb_col, k, iters)
    if C is None:
        # empty in, empty out (same contract as kmeans_local)
        return pa.table(
            {id_col: pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
        )

    cref = ray.put(C)

    def assign_final(batch: pa.Table) -> pa.Table:
        Cc = ray.get(cref)
        X = _emb_matrix(batch, emb_col)
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                "cluster": pa.array(_assign(X, Cc), pa.int64()),
            }
        )

    out = ds.map_batches(assign_final, batch_format="pyarrow").to_pandas()
    return pa.Table.from_pandas(out.sort_values(id_col), preserve_index=False)
