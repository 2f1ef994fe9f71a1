"""Kill/restore evidence at web scale: crawl the sharded xxxl (16M-URL)
fixture with periodic directory checkpoints, KILL the pipeline mid-bulk,
restore from the latest checkpoint in a fresh pipeline object, finish, and
verify the final fetch totals equal the known uninterrupted run.

The uninterrupted xxxl total (14,557,623 fetches / 31 rounds — reproduced
bit-exactly across runs, see BASELINE.md) is the expected value; equality
after a kill at round ``KILL_AT`` proves the checkpoint carries the FULL
scheduler state (frontier directory written worker-side, politeness
clocks, seen shards, spool lineage) at a scale where any driver-side
frontier pull would be visible.

Usage::

    python tools/resume_at_scale.py [scale] [kill_at]   # default xxxl 16
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECTED = {"xxxl": (14_557_623, 31)}


def main() -> None:
    scale = sys.argv[1] if len(sys.argv) > 1 else "xxxl"
    kill_at = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import shutil
    import tempfile

    import pyarrow.parquet as pq
    import ray.data as rd

    from anansi_ray import fixtures
    from anansi_ray.model import CrawlConfig
    from anansi_ray.pipelines.crawl import CrawlPipeline
    from anansi_ray.sources.webstore import META_NAME, bucketize_web

    fdir = fixtures.ensure_fixture(scale)
    store = os.path.join(fdir, "store")
    if not os.path.exists(os.path.join(store, META_NAME)):
        # sharded fixtures hold the web as a directory of shards; the
        # driver-safe small scales hold a single web.parquet file
        web_path = os.path.join(fdir, "web")
        if not os.path.exists(web_path):
            web_path = os.path.join(fdir, "web.parquet")
        bucketize_web(rd.read_parquet(web_path), store, n_buckets=64)
    tables = {
        n: pq.read_table(os.path.join(fdir, f"{n}.parquet")) for n in ("seeds", "hosts")
    }
    ckroot = tempfile.mkdtemp(prefix="anansi_resume_")
    try:
        cfg = CrawlConfig(checkpoint_dir=ckroot)
        cfg.host_state_backend = "sharded"

        t0 = time.time()
        p1 = CrawlPipeline(
            tables, cfg, budget=None, web_store_dir=store, checkpoint_every=5
        )
        pre = 0
        for _ in range(kill_at):
            n = p1.run_round()
            pre += n
            print(f"pre-kill round={p1.round} fetches={n} cum={pre}", flush=True)
            if n == 0:
                break
        print(f"KILL at round {p1.round} ({time.time() - t0:.1f}s)", flush=True)
        del p1

        latest = CrawlPipeline.latest_checkpoint(ckroot)
        assert latest is not None, "no checkpoint written before the kill"
        print(f"restoring from {latest}", flush=True)
        cfg2 = CrawlConfig(checkpoint_dir=ckroot)
        cfg2.host_state_backend = "sharded"
        p2 = CrawlPipeline(tables, cfg2, budget=None, web_store_dir=store)
        p2.restore(latest)
        ck_round = p2.round
        post = 0
        while True:
            n = p2.run_round()
            if n == 0:
                break
            post += n
            print(
                f"post-restore round={p2.round} fetches={n} cum={post}", flush=True
            )
        # round_metrics carries the full per-round lineage: the checkpoint
        # prefix (restored from the manifest) plus the replayed rounds —
        # its fetch column must reproduce the uninterrupted run exactly.
        total_rounds = p2.round
        per_round = [(m["round"], m["fetches"]) for m in p2.round_metrics]
        total = sum(f for _, f in per_round)
        expected_total, expected_rounds = EXPECTED.get(scale, (None, None))
        print(
            f"SUMMARY scale={scale} ck_round={ck_round} rounds={total_rounds} "
            f"total_fetches={total} wall_s={time.time() - t0:.1f}",
            flush=True,
        )
        if expected_rounds is not None:
            assert total_rounds == expected_rounds, (total_rounds, expected_rounds)
        if expected_total is not None:
            assert total == expected_total, (total, expected_total)
            print("RESUME-EXACT: totals match the uninterrupted run", flush=True)
    finally:
        shutil.rmtree(ckroot, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
