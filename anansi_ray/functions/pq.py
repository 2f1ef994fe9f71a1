"""Product-quantization ANN (Jégou et al., 2011 — "Product Quantization
for Nearest Neighbor Search") over an embedding column.

The third leg of the similarity-search family (brute-force cosine =
exact baseline, IVF = pruned-probe scale path, PQ = compressed-domain
scale path): the D-dim space is split into ``PQ_M`` subspaces, each
quantized by its own k-means codebook, so every vector compresses to
``PQ_M`` small codes and query-to-corpus distance is approximated by
ADC (asymmetric distance computation) — a table lookup + sum per
subspace, never touching the original vectors.  At 100 TB the encoded
corpus is ~D·4/M bytes per vector smaller than raw float32 and the
search pass is a streaming ``map_batches`` with per-batch partial
top-k; codebooks are tiny broadcast state (``ray.put`` once).

Determinism contract (the single-threaded :func:`knn_pq_local` twin
reproduces the distributed output bit-for-bit): codebook training per
subspace follows the ``clustering`` contract exactly — init from the
k smallest ids' subvectors, broadcast-subtract distances, argmin
(ties → lowest codeword), float64 mean ROUNDED to ``KM_ROUND`` each
iteration (the grid absorbs partial-sum drift); ADC distances sum the
``PQ_M`` per-subspace terms in fixed subspace order and are rounded to
``ADC_ROUND`` before the final (dist, vec_id) tie-broken top-k merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from anansi_ray.functions.clustering import (
    KM_ROUND,
    _assign,
    _emb_matrix,
    _init_centroids,
    _update,
)

PQ_M = 4          # subspaces
PQ_K = 16         # codewords per subspace
PQ_ITERS = 3
PQ_NQ = 5         # query vectors: the PQ_NQ smallest vec_ids
PQ_TOPK = 10
ADC_ROUND = 6

OUT_SPEC = {
    "query_id": pa.int64(),
    "rank": pa.int64(),
    "vec_id": pa.int64(),
    "adc": pa.float64(),
}


def _empty_out() -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in OUT_SPEC.items()})


def _sub(X: np.ndarray, m: int) -> np.ndarray:
    d = X.shape[1] // PQ_M
    return X[:, m * d : (m + 1) * d]


def _train_codebooks(ids: np.ndarray, X: np.ndarray, partials) -> list[np.ndarray]:
    """Shared training driver: ``ids``/``X`` seed the init (k smallest
    ids); ``partials(C_list) -> (sums, counts)`` supplies one epoch's
    per-codebook accumulations (local: one ``np.add.at`` sweep;
    distributed: merged per-batch partial tables)."""
    k = min(PQ_K, len(ids))
    C = [_init_centroids(ids, _sub(X, m), k) for m in range(PQ_M)]
    for _ in range(PQ_ITERS):
        sums, counts = partials(C)
        C = [_update(sums[m], counts[m], C[m]) for m in range(PQ_M)]
    return C


def _encode(X: np.ndarray, C: list[np.ndarray]) -> np.ndarray:
    return np.stack(
        [_assign(_sub(X, m), C[m]) for m in range(PQ_M)], axis=1
    )


def _adc_tables(Q: np.ndarray, C: list[np.ndarray]) -> list[np.ndarray]:
    """Per-query lookup tables: T[m][q, c] = ||q_m - C_m[c]||² (broadcast-
    subtract form, same reduction tree both twins)."""
    return [
        ((_sub(Q, m)[:, None, :] - C[m][None, :, :]) ** 2).sum(-1)
        for m in range(PQ_M)
    ]


def _adc_dists(codes: np.ndarray, T: list[np.ndarray]) -> np.ndarray:
    """(nq, n) approximate squared distances, fixed subspace order."""
    acc = T[0][:, codes[:, 0]]
    for m in range(1, PQ_M):
        acc = acc + T[m][:, codes[:, m]]
    return np.round(acc, ADC_ROUND)


def _topk_rows(
    qids: np.ndarray, ids: np.ndarray, D: np.ndarray, k: int
) -> pa.Table:
    """Per-query (dist, vec_id)-ordered top-k (self excluded) as rows."""
    out_q, out_v, out_d = [], [], []
    for qi, qid in enumerate(qids):
        mask = ids != qid
        cand_ids = ids[mask]
        cand_d = D[qi][mask]
        if len(cand_ids) == 0:
            continue
        order = np.lexsort((cand_ids, cand_d))[:k]
        out_q.append(np.full(len(order), qid, np.int64))
        out_v.append(cand_ids[order])
        out_d.append(cand_d[order])
    if not out_q:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "adc": pa.array([], pa.float64()),
            }
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "adc": pa.array(np.concatenate(out_d), pa.float64()),
        }
    )


def _finish(parts: pa.Table, k: int) -> pa.Table:
    """Driver merge of per-batch partial top-k rows → ranked final."""
    if parts.num_rows == 0:
        return _empty_out()
    q = parts["query_id"].to_numpy(zero_copy_only=False)
    v = parts["vec_id"].to_numpy(zero_copy_only=False)
    d = parts["adc"].to_numpy(zero_copy_only=False)
    order = np.lexsort((v, d, q))
    q, v, d = q[order], v[order], d[order]
    # rank within query; keep rank <= k
    newq = np.r_[True, q[1:] != q[:-1]]
    idx = np.arange(len(q))
    start = np.maximum.accumulate(np.where(newq, idx, 0))
    rank = idx - start + 1
    keep = rank <= k
    return pa.table(
        {
            "query_id": pa.array(q[keep], pa.int64()),
            "rank": pa.array(rank[keep], pa.int64()),
            "vec_id": pa.array(v[keep], pa.int64()),
            "adc": pa.array(d[keep], pa.float64()),
        }
    )


def _min_ids_seed(ds: rd.Dataset, id_col: str, emb_col: str, n: int):
    """Per-block partial min-n (ids + embeddings) → tiny driver merge."""
    def part(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        X = _emb_matrix(batch, emb_col)
        order = np.argsort(ids, kind="stable")[:n]
        return pa.table(
            {
                "id": pa.array(ids[order], pa.int64()),
                "emb": pa.array(list(X[order]), pa.list_(pa.float64())),
            }
        )

    tabs = [
        t
        for t in ray.get(
            ds.map_batches(part, batch_format="pyarrow").materialize().to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tabs:
        return None, None
    seed = pa.concat_tables(tabs)
    ids = seed["id"].to_numpy(zero_copy_only=False)
    X = np.stack([np.asarray(e, np.float64) for e in seed["emb"].to_pylist()])
    order = np.argsort(ids, kind="stable")[:n]
    return ids[order], X[order]


def knn_pq_distributed(
    ds: rd.Dataset, id_col: str = "vec_id", emb_col: str = "embedding"
) -> pa.Table:
    """Full PQ pipeline on Ray Data: train codebooks (per-batch partial
    sums), then ONE streaming encode+ADC+partial-top-k pass — the corpus
    never shuffles and never lands on the driver; per-batch driver
    traffic is O(nq · topk) rows."""
    ds = ds.materialize()
    seed_ids, seed_X = _min_ids_seed(ds, id_col, emb_col, max(PQ_K, PQ_NQ))
    if seed_ids is None:
        return _empty_out()
    k = min(PQ_K, len(seed_ids))

    def partials(C):
        cref = ray.put(C)

        def batch_part(batch: pa.Table) -> pa.Table:
            Cc = ray.get(cref)
            X = _emb_matrix(batch, emb_col)
            rows = []
            for m in range(PQ_M):
                Xs = _sub(X, m)
                a = _assign(Xs, Cc[m])
                sums = np.zeros((k, Xs.shape[1]))
                np.add.at(sums, a, Xs)
                counts = np.bincount(a, minlength=k).astype(np.float64)
                rows.append((m, sums, counts))
            return pa.table(
                {
                    "m": pa.array(
                        np.repeat([r[0] for r in rows], k), pa.int64()
                    ),
                    "c": pa.array(np.tile(np.arange(k), PQ_M), pa.int64()),
                    "n": pa.array(
                        np.concatenate([r[2] for r in rows]), pa.float64()
                    ),
                    "s": pa.array(
                        [list(v) for r in rows for v in r[1]],
                        pa.list_(pa.float64()),
                    ),
                }
            )

        tabs = [
            t
            for t in ray.get(
                ds.map_batches(batch_part, batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        d = seed_X.shape[1] // PQ_M
        sums = [np.zeros((k, d)) for _ in range(PQ_M)]
        counts = [np.zeros(k) for _ in range(PQ_M)]
        for t in tabs:
            ms = t["m"].to_numpy(zero_copy_only=False)
            cs = t["c"].to_numpy(zero_copy_only=False)
            ns = t["n"].to_numpy(zero_copy_only=False)
            ss = t["s"].to_pylist()
            for m_, c_, n_, s_ in zip(ms, cs, ns, ss):
                counts[m_][c_] += n_
                sums[m_][c_] += np.asarray(s_, np.float64)
        return sums, counts

    C = _train_codebooks(seed_ids, seed_X, partials)

    nq = min(PQ_NQ, len(seed_ids))
    qids = seed_ids[:nq]
    T = _adc_tables(seed_X[:nq], C)
    bref = ray.put((C, qids, T))

    def search(batch: pa.Table) -> pa.Table:
        Cc, qids_, T_ = ray.get(bref)
        X = _emb_matrix(batch, emb_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = _encode(X, Cc)
        D = _adc_dists(codes, T_)
        return _topk_rows(qids_, ids, D, PQ_TOPK)

    parts = (
        ds.map_batches(search, batch_format="pyarrow")
        .to_pandas()
    )
    return _finish(pa.Table.from_pandas(parts, preserve_index=False), PQ_TOPK)


def knn_pq_local(
    tbl: pa.Table, id_col: str = "vec_id", emb_col: str = "embedding"
) -> pa.Table:
    """Single-threaded twin (the oracle side): same kernels, sequential
    orchestration, one ``np.add.at`` sweep per training epoch."""
    ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) == 0:
        return _empty_out()
    X = _emb_matrix(tbl, emb_col)
    order = np.argsort(ids, kind="stable")
    k = min(PQ_K, len(ids))

    def partials(C):
        sums, counts = [], []
        for m in range(PQ_M):
            Xs = _sub(X, m)
            a = _assign(Xs, C[m])
            s = np.zeros((k, Xs.shape[1]))
            np.add.at(s, a, Xs)
            sums.append(s)
            counts.append(np.bincount(a, minlength=k).astype(np.float64))
        return sums, counts

    C = _train_codebooks(ids[order], X[order], partials)
    nq = min(PQ_NQ, len(ids))
    qsel = order[:nq]
    qids = ids[qsel]
    T = _adc_tables(X[qsel], C)
    codes = _encode(X, C)
    D = _adc_dists(codes, T)
    return _finish(_topk_rows(qids, ids, D, PQ_TOPK), PQ_TOPK)


# ---------------------------------------------------------------------------
# IVF+PQ composition (the FAISS "IVFADC" shape, Jégou et al. 2011 §IV):
# a coarse quantizer prunes the scan to ``IVF_NPROBE`` cells per query and
# PQ codes over RESIDUALS (x − coarse_centroid) give the compressed-domain
# distance within each probed cell.  At 100 TB this is the full scale
# recipe: the corpus is partitioned by coarse cell (a pruned read), each
# vector stores only PQ_M bytes of codes, and a query touches
# nprobe/n_cells of the data — the streaming ``map_batches`` search below
# does exactly that pruning per batch without any shuffle.
#
# Determinism contract (the :func:`knn_ivfpq_local` twin is bit-for-bit):
# coarse centroids follow the ``clustering`` contract (init = k smallest
# ids, broadcast-subtract distances, argmin ties → lowest cell, mean
# rounded to KM_ROUND per epoch); residuals are elementwise against the
# ROUNDED coarse centroids (no reduction → no drift); PQ codebooks train
# on residuals under the same contract; probe order is (distance, cell)
# lexicographic; ADC sums the PQ_M per-subspace terms in fixed order and
# rounds to ADC_ROUND before the (dist, vec_id) tie-broken top-k.

IVF_NC = 8        # coarse cells
IVF_NPROBE = 3    # cells probed per query
IVF_ITERS = 3     # coarse k-means epochs


def _coarse_fit_local(ids: np.ndarray, X: np.ndarray) -> np.ndarray:
    """Sequential coarse-quantizer training — mirrors clustering.kmeans_fit
    (same init / assign / rounded update) without the Ray plumbing."""
    k = min(IVF_NC, len(ids))
    C = _init_centroids(ids, X, k)
    for _ in range(IVF_ITERS):
        a = _assign(X, C)
        sums = np.zeros((k, X.shape[1]))
        np.add.at(sums, a, X)
        counts = np.bincount(a, minlength=k).astype(np.float64)
        C = _update(sums, counts, C)
    return C


def _probe_plan(Q: np.ndarray, qids: np.ndarray, Co: np.ndarray, Cb):
    """Per-query probe cells + per-(query, cell) residual ADC tables.
    Tiny (nq × nprobe × PQ_M × PQ_K floats) → broadcast once."""
    nprobe = min(IVF_NPROBE, Co.shape[0])
    probes, tables = [], []
    for qi in range(len(qids)):
        dq = ((Q[qi][None, :] - Co) ** 2).sum(-1)
        cells = np.lexsort((np.arange(Co.shape[0]), dq))[:nprobe]
        probes.append(cells)
        tabs_q = []
        for c in cells:
            qres = (Q[qi] - Co[c])[None, :]
            tabs_q.append([t[0] for t in _adc_tables(qres, Cb)])
        tables.append(tabs_q)
    return probes, tables


def _ivf_search(
    ids: np.ndarray,
    cells: np.ndarray,
    codes: np.ndarray,
    qids: np.ndarray,
    probes,
    tables,
    k: int,
) -> pa.Table:
    """Probed-cell ADC + per-query partial top-k (self excluded).  Each
    vector lives in exactly one cell, so candidates never duplicate."""
    out_q, out_v, out_d = [], [], []
    for qi, qid in enumerate(qids):
        cand_ids, cand_d = [], []
        for pi, c in enumerate(probes[qi]):
            sel = np.flatnonzero((cells == c) & (ids != qid))
            if len(sel) == 0:
                continue
            T = tables[qi][pi]
            acc = T[0][codes[sel, 0]]
            for m in range(1, PQ_M):
                acc = acc + T[m][codes[sel, m]]
            cand_ids.append(ids[sel])
            cand_d.append(np.round(acc, ADC_ROUND))
        if not cand_ids:
            continue
        cid = np.concatenate(cand_ids)
        cd = np.concatenate(cand_d)
        order = np.lexsort((cid, cd))[:k]
        out_q.append(np.full(len(order), qid, np.int64))
        out_v.append(cid[order])
        out_d.append(cd[order])
    if not out_q:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "adc": pa.array([], pa.float64()),
            }
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "adc": pa.array(np.concatenate(out_d), pa.float64()),
        }
    )


def knn_ivfpq_distributed(
    ds: rd.Dataset, id_col: str = "vec_id", emb_col: str = "embedding"
) -> pa.Table:
    """IVF+PQ on Ray Data: coarse centroids via the kmeans partial-sum
    contract, residual-PQ codebooks via the same contract, then ONE
    streaming assign→residual-encode→probed-ADC→partial-top-k pass.
    The corpus never shuffles; broadcast state is O(nc·dim + M·K·dim)."""
    from anansi_ray.functions.clustering import kmeans_fit

    ds = ds.materialize()
    seed_ids, seed_X = _min_ids_seed(ds, id_col, emb_col, max(PQ_K, PQ_NQ))
    if seed_ids is None:
        return _empty_out()
    Co = kmeans_fit(ds, id_col, emb_col, k=IVF_NC, iters=IVF_ITERS)
    k = min(PQ_K, len(seed_ids))
    seed_R = seed_X - Co[_assign(seed_X, Co)]

    def partials(C):
        cref = ray.put((C, Co))

        def batch_part(batch: pa.Table) -> pa.Table:
            Cc, Co_ = ray.get(cref)
            X = _emb_matrix(batch, emb_col)
            R = X - Co_[_assign(X, Co_)]
            rows = []
            for m in range(PQ_M):
                Rs = _sub(R, m)
                a = _assign(Rs, Cc[m])
                sums = np.zeros((k, Rs.shape[1]))
                np.add.at(sums, a, Rs)
                counts = np.bincount(a, minlength=k).astype(np.float64)
                rows.append((m, sums, counts))
            return pa.table(
                {
                    "m": pa.array(
                        np.repeat([r[0] for r in rows], k), pa.int64()
                    ),
                    "c": pa.array(np.tile(np.arange(k), PQ_M), pa.int64()),
                    "n": pa.array(
                        np.concatenate([r[2] for r in rows]), pa.float64()
                    ),
                    "s": pa.array(
                        [list(v) for r in rows for v in r[1]],
                        pa.list_(pa.float64()),
                    ),
                }
            )

        tabs = [
            t
            for t in ray.get(
                ds.map_batches(batch_part, batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        d = seed_X.shape[1] // PQ_M
        sums = [np.zeros((k, d)) for _ in range(PQ_M)]
        counts = [np.zeros(k) for _ in range(PQ_M)]
        for t in tabs:
            ms = t["m"].to_numpy(zero_copy_only=False)
            cs = t["c"].to_numpy(zero_copy_only=False)
            ns = t["n"].to_numpy(zero_copy_only=False)
            ss = t["s"].to_pylist()
            for m_, c_, n_, s_ in zip(ms, cs, ns, ss):
                counts[m_][c_] += n_
                sums[m_][c_] += np.asarray(s_, np.float64)
        return sums, counts

    Cb = _train_codebooks(seed_ids, seed_R, partials)

    nq = min(PQ_NQ, len(seed_ids))
    qids = seed_ids[:nq]
    probes, tables = _probe_plan(seed_X[:nq], qids, Co, Cb)
    bref = ray.put((Co, Cb, qids, probes, tables))

    def search(batch: pa.Table) -> pa.Table:
        Co_, Cb_, qids_, probes_, tables_ = ray.get(bref)
        X = _emb_matrix(batch, emb_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cells = _assign(X, Co_)
        codes = _encode(X - Co_[cells], Cb_)
        return _ivf_search(ids, cells, codes, qids_, probes_, tables_, PQ_TOPK)

    parts = ds.map_batches(search, batch_format="pyarrow").to_pandas()
    return _finish(pa.Table.from_pandas(parts, preserve_index=False), PQ_TOPK)


def knn_ivfpq_local(
    tbl: pa.Table, id_col: str = "vec_id", emb_col: str = "embedding"
) -> pa.Table:
    """Single-threaded twin (the oracle side): same kernels, sequential
    orchestration, one ``np.add.at`` sweep per training epoch."""
    ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) == 0:
        return _empty_out()
    X = _emb_matrix(tbl, emb_col)
    order = np.argsort(ids, kind="stable")
    Co = _coarse_fit_local(ids, X)
    cells = _assign(X, Co)
    R = X - Co[cells]
    k = min(PQ_K, len(ids))

    def partials(C):
        sums, counts = [], []
        for m in range(PQ_M):
            Rs = _sub(R, m)
            a = _assign(Rs, C[m])
            s = np.zeros((k, Rs.shape[1]))
            np.add.at(s, a, Rs)
            sums.append(s)
            counts.append(np.bincount(a, minlength=k).astype(np.float64))
        return sums, counts

    Cb = _train_codebooks(ids[order], R[order], partials)
    nq = min(PQ_NQ, len(ids))
    qsel = order[:nq]
    qids = ids[qsel]
    probes, tables = _probe_plan(X[qsel], qids, Co, Cb)
    codes = _encode(R, Cb)
    return _finish(
        _ivf_search(ids, cells, codes, qids, probes, tables, PQ_TOPK), PQ_TOPK
    )
