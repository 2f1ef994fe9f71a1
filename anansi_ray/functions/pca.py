"""Distributed PCA over the embedding column — the spectral member of
the vector-analytics family (Gram matrix and k-means already exist):
one streaming pass reduces every batch to (count, coordinate sums,
upper-triangle cross-product sums); the driver assembles the covariance
matrix and eigendecomposes the tiny dim×dim result.

Determinism contract (the :func:`pca_local` twin is bit-for-bit): the
covariance matrix is ROUNDED to ``PCA_ROUND`` decimals BEFORE the
eigendecomposition, so both twins hand LAPACK the identical matrix and
``eigvalsh`` returns identical eigenvalues (partial-sum drift between
block-wise and sequential accumulation lives ~1e-12, far inside the
rounding grid).  Only eigenVALUES (and explained-variance ratios) are
reported — eigenvectors carry a sign ambiguity that would make a value
oracle fragile for no analytical gain.

Scale shape: per-batch partials are O(dim²) floats regardless of batch
size; the corpus never shuffles and never lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from anansi_ray.functions.clustering import _emb_matrix

PCA_ROUND = 6

OUT_SPEC = {
    "component": pa.int64(),
    "eigenvalue": pa.float64(),
    "explained_ratio": pa.float64(),
}


def _empty_out() -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in OUT_SPEC.items()})


def cov_partial(batch: pa.Table, emb_col: str = "embedding") -> pa.Table:
    X = _emb_matrix(batch, emb_col)
    return pa.table(
        {
            "n": pa.array([float(len(X))], pa.float64()),
            "s": pa.array([list(X.sum(axis=0))], pa.list_(pa.float64())),
            "xx": pa.array([list((X.T @ X).ravel())], pa.list_(pa.float64())),
        }
    )


def _finish(n: float, s: np.ndarray, xx: np.ndarray) -> pa.Table:
    d = len(s)
    if n < 2:
        return _empty_out()
    mean = s / n
    cov = (xx.reshape(d, d) - n * np.outer(mean, mean)) / (n - 1.0)
    cov = np.round(cov, PCA_ROUND)
    ev = np.linalg.eigvalsh(cov)[::-1]  # descending
    ev = np.round(ev, PCA_ROUND)
    tot = float(ev.sum())
    ratio = np.round(ev / tot, PCA_ROUND) if tot > 0 else np.zeros(d)
    return pa.table(
        {
            "component": pa.array(np.arange(1, d + 1), pa.int64()),
            "eigenvalue": pa.array(ev, pa.float64()),
            "explained_ratio": pa.array(ratio, pa.float64()),
        }
    )


def pca_distributed(ds: rd.Dataset, emb_col: str = "embedding") -> pa.Table:
    parts = ds.map_batches(
        lambda b: cov_partial(b, emb_col), batch_format="pyarrow"
    ).to_pandas()
    if len(parts) == 0:
        return _empty_out()
    n = float(parts["n"].sum())
    s = np.sum(np.stack([np.asarray(x, np.float64) for x in parts["s"]]), axis=0)
    xx = np.sum(np.stack([np.asarray(x, np.float64) for x in parts["xx"]]), axis=0)
    return _finish(n, s, xx)


def pca_local(tbl: pa.Table, emb_col: str = "embedding") -> pa.Table:
    """Single-threaded twin: one cov_partial slice is the whole corpus."""
    if tbl.num_rows == 0:
        return _empty_out()
    p = cov_partial(tbl, emb_col)
    return _finish(
        float(p["n"][0].as_py()),
        np.asarray(p["s"][0].as_py(), np.float64),
        np.asarray(p["xx"][0].as_py(), np.float64),
    )
