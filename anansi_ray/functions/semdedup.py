"""SemDeDup-style semantic deduplication over an embedding column.

The two-phase shape from the SemDeDup paper (Abbas et al., 2023 —
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication"): k-means the embedding space, then deduplicate ONLY
within each cluster by pairwise cosine, keeping one representative per
near-duplicate group.  Clustering bounds the quadratic step — pairwise
cost is O(Σ c_i²·dim) over cluster sizes c_i instead of O(n²·dim), and
at scale k is chosen ∝ n so the per-cluster size (and therefore the
per-partition kernel cost) stays constant.

Ray shape:

* centroid training: :func:`clustering.kmeans_fit` — per-batch partial
  sums, driver traffic O(k·dim) per iteration, corpus never shuffles.
* assignment + dedup: ONE coarse hash exchange on the cluster id (the
  house ``part`` pattern — every cluster lands whole in one partition),
  then a vectorized per-partition kernel walks cluster runs and marks
  representatives.  No driver-side pair set, no all-pairs across
  clusters.

Determinism contract (what makes the single-threaded
:func:`semantic_dedup_local` twin reproduce the distributed output
bit-for-bit): cluster assignments inherit the ``kmeans_fit`` /
``kmeans_local`` rounding contract; inside a cluster rows are sorted by
id before the cosine matrix is formed (same matrix shape + layout in
both twins), cosines are rounded to ``SEM_ROUND`` decimals before the
threshold test, and the duplicate-group representative is the
connected-component minimum id under vectorized min-label propagation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from anansi_ray.functions.clustering import (
    KM_ITERS,
    KM_K,
    _assign,
    _emb_matrix,
    kmeans_fit,
    kmeans_local,
)

SEM_TAU = 0.45
SEM_ROUND = 6
SEM_PARTS = 32

OUT_SPEC = {
    "vec_id": pa.int64(),
    "cluster": pa.int64(),
    "rep_id": pa.int64(),
    "keep": pa.int64(),
}


def _empty_out() -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in OUT_SPEC.items()})


def semdedup_cluster_kernel(
    ids: np.ndarray, X: np.ndarray, tau: float = SEM_TAU
) -> tuple[np.ndarray, np.ndarray]:
    """One cluster's dedup: returns (rep_id, keep) aligned to ``ids``
    sorted ascending (caller must pass ids pre-sorted).  Vectorized
    min-label propagation over the thresholded cosine adjacency — the
    component minimum is the kept representative."""
    n = len(ids)
    if n == 0:
        return np.array([], np.int64), np.array([], np.int64)
    nrm = np.sqrt((X * X).sum(axis=1))
    nrm[nrm < 1e-12] = 1e-12
    Xn = X / nrm[:, None]
    cos = np.round(Xn @ Xn.T, SEM_ROUND)
    adj = cos >= tau
    np.fill_diagonal(adj, True)
    lab = ids.astype(np.int64)
    big = np.iinfo(np.int64).max
    while True:
        nb = np.where(adj, lab[None, :], big).min(axis=1)
        if np.array_equal(nb, lab):
            break
        lab = nb
    return lab, (lab == ids).astype(np.int64)


def _dedup_runs(tbl: pa.Table, tau: float) -> pa.Table:
    """Partition kernel: rows sorted by (cluster, vec_id); apply the
    cluster kernel per cluster run."""
    if tbl.num_rows == 0:
        return _empty_out()
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cl = tbl["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, cl))
    ids, cl = ids[order], cl[order]
    X = _emb_matrix(tbl, "embedding")[order]
    bounds = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1], True])
    reps = np.empty(len(ids), np.int64)
    keep = np.empty(len(ids), np.int64)
    for s, e in zip(bounds[:-1], bounds[1:]):
        reps[s:e], keep[s:e] = semdedup_cluster_kernel(ids[s:e], X[s:e], tau)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(cl, pa.int64()),
            "rep_id": pa.array(reps, pa.int64()),
            "keep": pa.array(keep, pa.int64()),
        }
    )


def semantic_dedup_distributed(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = KM_K,
    iters: int = KM_ITERS,
    tau: float = SEM_TAU,
    n_parts: int = SEM_PARTS,
) -> rd.Dataset:
    """Full SemDeDup pipeline on Ray Data.  Output: one row per input
    vector — (vec_id, cluster, rep_id, keep) where ``keep=1`` marks the
    component-minimum representative of its within-cluster duplicate
    group (singletons keep themselves)."""
    ds = ds.materialize()
    C = kmeans_fit(ds, id_col, emb_col, k, iters)
    if C is None:
        from anansi_ray.arrowds import from_arrow_local

        return from_arrow_local([_empty_out()])
    cref = ray.put(C)

    def stamp(batch: pa.Table) -> pa.Table:
        Cc = ray.get(cref)
        X = _emb_matrix(batch, emb_col)
        a = _assign(X, Cc).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "cluster": pa.array(a, pa.int64()),
                "embedding": batch[emb_col].combine_chunks(),
                # coarse exchange key: every cluster lands whole in one
                # partition; partition count stays bounded (house pattern)
                "part": pa.array(a % n_parts, pa.int64()),
            }
        )

    stamped = ds.map_batches(stamp, batch_format="pyarrow")
    out = stamped.groupby("part").map_groups(
        lambda t: _dedup_runs(t.drop_columns(["part"]), tau),
        batch_format="pyarrow",
    )
    return out


def semantic_dedup_local(
    tbl: pa.Table,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = KM_K,
    iters: int = KM_ITERS,
    tau: float = SEM_TAU,
) -> pa.Table:
    """Single-threaded twin (the oracle side): kmeans_local assignment +
    the same per-cluster kernel, sequential orchestration."""
    assign = kmeans_local(tbl, id_col, emb_col, k, iters)
    if assign.num_rows == 0:
        return _empty_out()
    ids = assign[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    cl = assign["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
    # kmeans_local preserves input row order; align X to it
    X = _emb_matrix(tbl, emb_col)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(cl, pa.int64()),
            "embedding": pa.array(list(X), pa.list_(pa.float64())),
        }
    )
    out = _dedup_runs(t, tau)
    order = np.argsort(out["vec_id"].to_numpy(zero_copy_only=False), kind="stable")
    return out.take(order)
