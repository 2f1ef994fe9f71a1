"""Distributed ALS matrix factorization (Koren/Bell/Volinsky 2009; the
Spark-MLlib-style alternating least squares) over the implicit
customer × part "ratings" derived from orders ⨝ lineitem (rating =
total quantity ever ordered).

Why this shape survives 100 TB: ALS's user step needs ONLY the broadcast
item-factor matrix plus the user's own rows, so user factors are never
materialized globally — each iteration recomputes them batch-locally
inside a user-co-partitioned pass.  The item step's normal equations
(A_i = Σ x_u x_uᵀ + λI, b_i = Σ x_u r_ui over raters) are associative
sums, so each batch emits per-item K²+K partials and only the bounded
item catalog is merged centrally (at catalog scale this merge becomes
one coarse exchange; here the driver sums O(blocks · items) tiny rows —
the kmeans/logreg precedent).  Ratings are co-partitioned by user hash
ONCE; every iteration is a single streaming pass with zero shuffles.

Determinism contract (the :func:`als_local` twin is bit-for-bit):
ratings are integer-valued sums (exact in float64); rows are sorted
(custkey, partkey) inside every partition so each user's accumulation
order is identical in both twins; item factors are initialized by a
shared pure function of partkey and ROUNDED to ``ALS_ROUND`` after every
item-step solve — the rounding grid absorbs the ~1e-13 drift between
block-wise and sequential partial-sum merging (user factors need no
rounding: they are deterministic functions of the rounded Y and the
user's own canonically-ordered rows).  Items with no ratings keep their
previous rounded factors (the kmeans empty-cluster rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

ALS_K = 4
ALS_ITERS = 3
ALS_LAMBDA = 0.5
ALS_ROUND = 6

OUT_SPEC = {
    "partkey": pa.int64(),
    "j": pa.int64(),
    "factor": pa.float64(),
}


def _empty_out() -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in OUT_SPEC.items()})


def init_item_factors(partkeys: np.ndarray) -> np.ndarray:
    """Deterministic, corpus-independent init: a fixed pure function of
    the part key (shared by both twins)."""
    pk = partkeys.astype(np.int64)
    Y = np.empty((len(pk), ALS_K), np.float64)
    for j in range(ALS_K):
        Y[:, j] = ((pk * (j + 1)) % 97) / 97.0 + 0.1
    return np.round(Y, ALS_ROUND)


def user_item_pass(
    u: np.ndarray, i: np.ndarray, r: np.ndarray,
    item_keys: np.ndarray, Y: np.ndarray,
):
    """One half-iteration over a (canonically ordered) ratings slice:
    solve every user's factors batch-locally, then emit per-item normal-
    equation partials (A flattened K², b K) — the shared kernel of both
    twins.  Inputs MUST be sorted by (u, i)."""
    iidx = np.searchsorted(item_keys, i)
    yi = Y[iidx]  # (n, K)
    uu, uinv = np.unique(u, return_inverse=True)
    nu = len(uu)
    A = np.zeros((nu, ALS_K, ALS_K))
    A[:] = ALS_LAMBDA * np.eye(ALS_K)
    np.add.at(A, uinv, yi[:, :, None] * yi[:, None, :])
    b = np.zeros((nu, ALS_K))
    np.add.at(b, uinv, yi * r[:, None])
    X = np.linalg.solve(A, b)  # (nu, K), independent 4x4 solves
    xu = X[uinv]  # (n, K) back onto rows
    # per-item partials within this slice
    ii, iinv = np.unique(iidx, return_inverse=True)
    ni = len(ii)
    Ai = np.zeros((ni, ALS_K * ALS_K))
    np.add.at(Ai, iinv, (xu[:, :, None] * xu[:, None, :]).reshape(len(u), -1))
    bi = np.zeros((ni, ALS_K))
    np.add.at(bi, iinv, xu * r[:, None])
    return item_keys[ii], Ai, bi


def solve_items(
    item_keys: np.ndarray, prev_Y: np.ndarray,
    part_keys: np.ndarray, A_flat: np.ndarray, b: np.ndarray,
) -> np.ndarray:
    """Item-step solve from merged partials; unrated items keep their
    previous rounded factors."""
    Y = prev_Y.copy()
    if len(part_keys):
        idx = np.searchsorted(item_keys, part_keys)
        A = A_flat.reshape(-1, ALS_K, ALS_K) + ALS_LAMBDA * np.eye(ALS_K)
        Y[idx] = np.linalg.solve(A, b)
    return np.round(Y, ALS_ROUND)


def _factors_table(item_keys: np.ndarray, Y: np.ndarray) -> pa.Table:
    n = len(item_keys)
    return pa.table(
        {
            "partkey": pa.array(np.repeat(item_keys, ALS_K), pa.int64()),
            "j": pa.array(np.tile(np.arange(ALS_K), n), pa.int64()),
            "factor": pa.array(Y.ravel(), pa.float64()),
        }
    )


def als_distributed(ratings: rd.Dataset) -> pa.Table:
    """``ratings`` must have int64 columns (custkey, partkey) and float64
    qty.  Co-partitions by user hash ONCE; each iteration is one
    streaming pass emitting bounded per-item partials."""
    B = 32

    def tag(batch: pa.Table) -> pa.Table:
        u = batch["custkey"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "ubucket", pa.array((u % B).astype(np.int32), pa.int32())
        )

    parts = (
        ratings.map_batches(tag, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(lambda g: g, batch_format="pyarrow")
        .materialize()
    )

    # bounded global item-key list: per-batch distinct partials → driver
    key_parts = parts.map_batches(
        lambda b: pa.table(
            {
                "partkey": pa.array(
                    np.unique(b["partkey"].to_numpy(zero_copy_only=False)),
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    if len(key_parts) == 0:
        return _empty_out()
    item_keys = np.unique(key_parts["partkey"].to_numpy(dtype=np.int64))
    Y = init_item_factors(item_keys)

    for _ in range(ALS_ITERS):
        bref = ray.put((item_keys, Y))

        def it_pass(batch: pa.Table) -> pa.Table:
            ik, Y_ = ray.get(bref)
            u = batch["custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            i = batch["partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            r = batch["qty"].to_numpy(zero_copy_only=False).astype(np.float64)
            order = np.lexsort((i, u))  # canonical within-partition order
            pk, Ai, bi = user_item_pass(u[order], i[order], r[order], ik, Y_)
            # wide numeric columns so the driver merge is one vectorized
            # groupby-sum, not a per-item Python loop
            cols: dict = {"partkey": pa.array(pk, pa.int64())}
            for c in range(ALS_K * ALS_K):
                cols[f"a{c}"] = pa.array(Ai[:, c], pa.float64())
            for c in range(ALS_K):
                cols[f"b{c}"] = pa.array(bi[:, c], pa.float64())
            return pa.table(cols)

        merged = parts.map_batches(
            it_pass, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        if len(merged) == 0:
            return _empty_out()
        g = merged.groupby("partkey", sort=True).sum()
        pks = g.index.to_numpy(dtype=np.int64)
        A_flat = g[[f"a{c}" for c in range(ALS_K * ALS_K)]].to_numpy()
        b_sum = g[[f"b{c}" for c in range(ALS_K)]].to_numpy()
        Y = solve_items(item_keys, Y, pks, A_flat, b_sum)

    return _factors_table(item_keys, Y)


def als_local(ratings: pa.Table) -> pa.Table:
    """Single-threaded twin: same kernels, whole ratings table as one
    canonically ordered slice."""
    if ratings.num_rows == 0:
        return _empty_out()
    u = ratings["custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    i = ratings["partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    r = ratings["qty"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.lexsort((i, u))
    u, i, r = u[order], i[order], r[order]
    item_keys = np.unique(i)
    Y = init_item_factors(item_keys)
    for _ in range(ALS_ITERS):
        pk, Ai, bi = user_item_pass(u, i, r, item_keys, Y)
        Y = solve_items(item_keys, Y, pk, Ai, bi)
    return _factors_table(item_keys, Y)
