"""Distributed ALS (functions/als.py): the user-co-partitioned pass +
central item solve must land on the sequential twin bit-for-bit across
block layouts, and the factorization must actually fit a low-rank
ratings matrix better than its deterministic init."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anansi_ray.functions.als import (
    ALS_K,
    als_distributed,
    als_local,
    init_item_factors,
)


def _ratings(n_users=40, n_items=25, seed=11):
    rng = np.random.default_rng(seed)
    # low-rank ground truth
    U = rng.normal(size=(n_users, ALS_K))
    V = rng.normal(size=(n_items, ALS_K))
    rows = []
    for u in range(n_users):
        for i in rng.choice(n_items, size=min(8, n_items), replace=False):
            rows.append((u + 1, (i + 1) * 10, float(max(1, round(U[u] @ V[i] + 5)))))
    rows.sort()
    return pa.table(
        {
            "custkey": pa.array([r[0] for r in rows], pa.int64()),
            "partkey": pa.array([r[1] for r in rows], pa.int64()),
            "qty": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def _rmse(ratings, factors):
    f = factors.to_pandas().pivot(index="partkey", columns="j", values="factor")
    item_keys = f.index.to_numpy()
    Y = f.to_numpy()
    df = ratings.to_pandas()
    # user factors from the final Y (one exact user step), then residual
    from anansi_ray.functions.als import ALS_LAMBDA

    err, n = 0.0, 0
    for u, grp in df.groupby("custkey"):
        yi = Y[np.searchsorted(item_keys, grp["partkey"].to_numpy())]
        A = ALS_LAMBDA * np.eye(ALS_K) + yi.T @ yi
        x = np.linalg.solve(A, yi.T @ grp["qty"].to_numpy())
        err += float(((yi @ x - grp["qty"].to_numpy()) ** 2).sum())
        n += len(grp)
    return np.sqrt(err / n)


@pytest.mark.usefixtures("ray_session")
class TestALS:
    def test_distributed_matches_local_across_block_layouts(self):
        t = _ratings()
        exp = als_local(t).to_pandas()
        for nb in (1, 4, 9):
            got = als_distributed(
                rd.from_arrow(t).repartition(nb)
            ).to_pandas()
            assert got.equals(exp), f"mismatch at nblocks={nb}"

    def test_training_reduces_reconstruction_error(self):
        t = _ratings()
        trained = als_local(t)
        item_keys = np.unique(t["partkey"].to_numpy(zero_copy_only=False))
        init = init_item_factors(item_keys)
        init_tbl = pa.table(
            {
                "partkey": pa.array(np.repeat(item_keys, ALS_K), pa.int64()),
                "j": pa.array(
                    np.tile(np.arange(ALS_K), len(item_keys)), pa.int64()
                ),
                "factor": pa.array(init.ravel(), pa.float64()),
            }
        )
        assert _rmse(t, trained) < _rmse(t, init_tbl)

    def test_shapes_and_rounding(self):
        t = _ratings(n_users=5, n_items=4)
        out = als_local(t).to_pandas()
        assert len(out) == 4 * ALS_K
        f = out["factor"].to_numpy()
        assert np.allclose(f, np.round(f, 6))

    def test_empty(self):
        t = pa.table(
            {
                "custkey": pa.array([], pa.int64()),
                "partkey": pa.array([], pa.int64()),
                "qty": pa.array([], pa.float64()),
            }
        )
        assert als_local(t).num_rows == 0
        assert als_distributed(rd.from_arrow(t)).num_rows == 0

    def test_single_rating(self):
        t = pa.table(
            {
                "custkey": pa.array([7], pa.int64()),
                "partkey": pa.array([3], pa.int64()),
                "qty": pa.array([2.0], pa.float64()),
            }
        )
        exp = als_local(t).to_pandas()
        got = als_distributed(rd.from_arrow(t)).to_pandas()
        assert got.equals(exp)
        assert len(exp) == ALS_K
