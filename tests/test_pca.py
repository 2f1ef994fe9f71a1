"""Distributed PCA (functions/pca.py): covariance-partial merge must
land on the sequential twin bit-for-bit across block layouts (the
rounded-covariance contract), and the spectrum must match numpy's own
PCA on a known low-rank input."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anansi_ray.functions.pca import pca_distributed, pca_local


def _emb(n=300, dim=8, rank=3, seed=5):
    rng = np.random.default_rng(seed)
    scale = np.array([5.0, 2.0, 1.0][:rank])[:, None] if rank <= 3 else 1.0
    W = rng.normal(size=(rank, dim)) * scale
    X = rng.normal(size=(n, rank)) @ W + 0.01 * rng.normal(size=(n, dim))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [r.astype(np.float32) for r in X], pa.list_(pa.float32())
            ),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestPCA:
    def test_distributed_matches_local_across_layouts(self):
        t = _emb()
        exp = pca_local(t).to_pandas()
        for nb in (1, 4, 9):
            got = pca_distributed(rd.from_arrow(t).repartition(nb)).to_pandas()
            assert got.equals(exp), f"mismatch at nblocks={nb}"

    def test_low_rank_spectrum(self):
        out = pca_local(_emb()).to_pandas()
        ev = out["eigenvalue"].to_numpy()
        assert (np.diff(ev) <= 0).all()
        # rank-3 signal + tiny noise: top-3 carry ~all the variance
        assert out["explained_ratio"].iloc[:3].sum() > 0.99
        assert abs(out["explained_ratio"].sum() - 1.0) < 1e-4

    def test_matches_numpy_cov(self):
        t = _emb(n=120, dim=6)
        X = np.stack([np.asarray(e, np.float64) for e in t["embedding"].to_pylist()])
        ref = np.sort(np.linalg.eigvalsh(np.cov(X, rowvar=False)))[::-1]
        got = pca_local(t).to_pandas()["eigenvalue"].to_numpy()
        assert np.allclose(got, ref, atol=1e-5)

    def test_degenerate(self):
        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
        assert pca_local(empty).num_rows == 0
        one = _emb(n=1)
        assert pca_local(one).num_rows == 0  # covariance undefined at n=1
