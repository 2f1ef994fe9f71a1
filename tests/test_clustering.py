"""k-means (functions/clustering.py): the distributed partial-sum path
must land on the single-threaded twin's assignment exactly, whatever the
block layout — that equality is what the determinism contract (rounded
centroids per iteration, shape-independent distance reduction) buys."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anansi_ray.functions.clustering import kmeans_distributed, kmeans_local


def _synth(n=200, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(4, dim)) * 5
    X = centers[rng.integers(0, 4, n)] + rng.normal(size=(n, dim))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in X], pa.list_(pa.float32())
            ),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestKMeans:
    def test_distributed_matches_local_across_block_layouts(self):
        tbl = _synth()
        exp = kmeans_local(tbl)
        for slices in (1, 3, 7):
            step = (tbl.num_rows + slices - 1) // slices
            ds = rd.from_arrow(
                [tbl.slice(i, step) for i in range(0, tbl.num_rows, step)]
            )
            got = kmeans_distributed(ds)
            assert got["cluster"].to_pylist() == exp["cluster"].to_pylist(), slices
            assert got["vec_id"].to_pylist() == exp["vec_id"].to_pylist()

    def test_clusters_are_used(self):
        out = kmeans_local(_synth())
        # 4 well-separated synthetic centers -> at least 4 populated clusters
        assert len(set(out["cluster"].to_pylist())) >= 4
