"""Checkpoint/resume: kill after round k, restore, final state must match an
uninterrupted run (SURVEY.md §5.3)."""

import shutil

import pytest

from anansi_ray import fixtures
from anansi_ray.model import CrawlConfig
from anansi_ray.oracle import reference_crawl


@pytest.mark.usefixtures("ray_session")
def test_resume_matches_uninterrupted(tmp_path):
    from anansi_ray.pipelines.crawl import CrawlPipeline

    tiny = fixtures.generate("tiny", seed=42)
    ckdir = str(tmp_path / "ckpt")
    cfg = CrawlConfig(checkpoint_dir=ckdir)

    # uninterrupted reference result (oracle — cheapest ground truth)
    oracle = reference_crawl(tiny, cfg, budget=None)

    # run with checkpoints every 5 rounds, "crash" after 12 rounds
    p1 = CrawlPipeline(tiny, cfg, budget=None, checkpoint_every=5)
    for _ in range(12):
        if p1.run_round() == 0:
            break
    del p1  # simulate driver death; actors get re-created on restore

    latest = CrawlPipeline.latest_checkpoint(ckdir)
    assert latest is not None and latest.endswith("round=10")

    # fresh pipeline object (fresh seen-set actors), restore, finish the crawl
    p2 = CrawlPipeline(tiny, cfg, budget=None)
    p2.restore(latest)
    assert p2.round == 10
    res = p2.run()

    exp = oracle["expected_crawl"]
    got = res["expected_crawl"]
    assert got.num_rows == exp.num_rows
    for col in ("seq", "fetch_clock_ms", "url_hash", "state", "status"):
        assert got[col].to_pylist() == exp[col].to_pylist(), col
    exp_ledger = {
        (r["url_hash"], r["state"], r["next_fetch_ms"])
        for r in oracle["ledger"].to_pylist()
    }
    got_ledger = {
        (r["url_hash"], r["state"], r["next_fetch_ms"])
        for r in res["ledger"].to_pylist()
    }
    assert got_ledger == exp_ledger

    shutil.rmtree(ckdir, ignore_errors=True)


@pytest.mark.usefixtures("ray_session")
def test_resume_distributed_plane(tmp_path):
    """Same kill/restore contract with the frontier forced onto the
    distributed plane: the checkpoint writes the frontier as a partitioned
    parquet DIRECTORY straight from the workers (never via the driver), and
    restore reads it back distributedly.  Result must still be order-exact."""
    import os

    from anansi_ray.pipelines.crawl import CrawlPipeline

    tiny = fixtures.generate("tiny", seed=42)
    ckdir = str(tmp_path / "ckpt")
    cfg = CrawlConfig(checkpoint_dir=ckdir)

    oracle = reference_crawl(tiny, cfg, budget=None)

    p1 = CrawlPipeline(
        tiny, cfg, budget=None, checkpoint_every=5, driver_plane_threshold=0
    )
    for _ in range(12):
        if p1.run_round() == 0:
            break
    del p1

    latest = CrawlPipeline.latest_checkpoint(ckdir)
    assert latest is not None and latest.endswith("round=10")
    # the distributed plane checkpointed a directory, not a driver table
    assert os.path.isdir(os.path.join(latest, "frontier"))
    assert not os.path.exists(os.path.join(latest, "frontier.parquet"))

    p2 = CrawlPipeline(tiny, cfg, budget=None, driver_plane_threshold=0)
    p2.restore(latest)
    assert p2.round == 10
    res = p2.run()

    exp = oracle["expected_crawl"]
    got = res["expected_crawl"]
    assert got.num_rows == exp.num_rows
    for col in ("seq", "fetch_clock_ms", "url_hash", "state", "status"):
        assert got[col].to_pylist() == exp[col].to_pylist(), col


@pytest.mark.usefixtures("ray_session")
def test_resume_distributed_plane_bucketed_store(tmp_path):
    """Full at-scale composition under kill/restore: distributed plane +
    bucketed web store + directory checkpoint together — the exact shape a
    10^10-frontier run would resume in."""
    from anansi_ray.pipelines.crawl import CrawlPipeline

    tiny = fixtures.generate("tiny", seed=42)
    ckdir = str(tmp_path / "ckpt")
    cfg = CrawlConfig(checkpoint_dir=ckdir)
    store_kw = dict(
        driver_plane_threshold=0,
        web_store_dir=str(tmp_path / "webstore"),
        web_store_buckets=8,
    )

    oracle = reference_crawl(tiny, cfg, budget=None)

    p1 = CrawlPipeline(tiny, cfg, budget=None, checkpoint_every=5, **store_kw)
    for _ in range(8):
        if p1.run_round() == 0:
            break
    del p1

    latest = CrawlPipeline.latest_checkpoint(ckdir)
    assert latest is not None and latest.endswith("round=5")

    p2 = CrawlPipeline(tiny, cfg, budget=None, **store_kw)
    p2.restore(latest)
    res = p2.run()

    exp = oracle["expected_crawl"]
    got = res["expected_crawl"]
    assert got.num_rows == exp.num_rows
    for col in ("seq", "fetch_clock_ms", "url_hash", "state", "status"):
        assert got[col].to_pylist() == exp[col].to_pylist(), col


@pytest.mark.usefixtures("ray_session")
def test_stale_spool_round_overwritten(tmp_path):
    """Per-partition lineage: a round dir left by a killed writer (no
    _MANIFEST, junk content) is wholly overwritten when the round re-runs —
    results never mix stale and fresh files."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from anansi_ray.pipelines.crawl import CrawlPipeline

    tiny = fixtures.generate("tiny", seed=42)
    spool = str(tmp_path / "spool")
    junk_dir = os.path.join(spool, "round=0")
    os.makedirs(junk_dir)
    pq.write_table(
        pa.table({"garbage": [1, 2, 3]}), os.path.join(junk_dir, "junk.parquet")
    )

    pipe = CrawlPipeline(tiny, CrawlConfig(), spool_dir=spool)
    res = pipe.run()
    oracle = reference_crawl(tiny, CrawlConfig())
    assert res["expected_crawl"].num_rows == oracle["expected_crawl"].num_rows
    assert not os.path.exists(os.path.join(junk_dir, "junk.parquet"))
    assert os.path.exists(os.path.join(junk_dir, "_MANIFEST.json"))
