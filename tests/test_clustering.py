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


@pytest.mark.usefixtures("ray_session")
class TestKMeansResume:
    def test_kill_and_resume_bitequal(self, tmp_path):
        """Kill between supersteps, resume from the committed centroid
        checkpoint → bit-equal centroids (the rounding contract makes the
        resumed trajectory identical)."""
        from anansi_ray.functions.clustering import (
            _latest_km_checkpoint,
            kmeans_fit,
        )

        tbl = _synth()
        ds = rd.from_arrow(tbl).materialize()
        want = kmeans_fit(ds, iters=5)

        ck = str(tmp_path / "km_ck")
        killed = kmeans_fit(ds, iters=5, checkpoint_dir=ck, stop_after=2)
        assert killed is None
        latest = _latest_km_checkpoint(ck)
        assert latest is not None and latest[0] == 1  # supersteps 0,1 done

        got = kmeans_fit(ds, iters=5, checkpoint_dir=ck, resume=True)
        assert np.array_equal(got, want)
        latest = _latest_km_checkpoint(ck)
        assert latest is not None and latest[0] == 4  # final committed, prior pruned

    def test_straggler_tmp_files_ignored(self, tmp_path):
        from anansi_ray.functions.clustering import _latest_km_checkpoint

        ck = tmp_path / "km_ck"
        ck.mkdir()
        (ck / "iter_0003.npz.tmp-999.npz").write_bytes(b"partial")
        assert _latest_km_checkpoint(str(ck)) is None

    def test_resume_without_checkpoint_runs_fresh(self, tmp_path):
        from anansi_ray.functions.clustering import kmeans_fit

        tbl = _synth(n=60)
        ds = rd.from_arrow(tbl).materialize()
        got = kmeans_fit(
            ds, iters=2, checkpoint_dir=str(tmp_path / "none"), resume=True
        )
        want = kmeans_fit(ds, iters=2)
        assert np.array_equal(got, want)
