"""Driver-memory evidence for the streaming spool design: run a large crawl
and print driver RSS after every round.

The round outputs (records/ledger/docs) stream to the per-round parquet
spool, so driver RSS must stay flat as fetched volume grows — the round-1
design accumulated them in driver lists, growing RSS linearly with the
crawl.  Usage::

    python tools/measure_driver_rss.py [scale]   # default xl (1M URLs)

Prints one line per round: round, fetches, cumulative fetches, driver RSS
MiB — plus a summary line comparing RSS after the first big round vs the
end.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mib() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> None:
    scale = sys.argv[1] if len(sys.argv) > 1 else "xl"

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

    import pyarrow.parquet as pq

    from anansi_ray import fixtures
    from anansi_ray.model import CrawlConfig
    from anansi_ray.pipelines.crawl import CrawlPipeline

    fdir = fixtures.ensure_fixture(scale)
    sharded = fixtures.SCALES.get(scale, {}).get("sharded", False)
    if sharded:
        # xxxl shape: the web NEVER lands on the driver — sharded fixture
        # parquet → distributed bucketize → bucketed store; politeness
        # counters in sharded actors, bookkeeping fully distributed
        import ray.data as rd

        from anansi_ray.sources.webstore import META_NAME, bucketize_web

        store = os.path.join(fdir, "store")
        if not os.path.exists(os.path.join(store, META_NAME)):
            t0 = time.time()
            bucketize_web(
                rd.read_parquet(os.path.join(fdir, "web")), store, n_buckets=64
            )
            print(f"bucketize: {time.time() - t0:.1f}s rss={rss_mib():.1f} MiB")
        tables = {
            n: pq.read_table(os.path.join(fdir, f"{n}.parquet"))
            for n in ("seeds", "hosts")
        }
        cfg = CrawlConfig()
        cfg.host_state_backend = "sharded"
        pipe = CrawlPipeline(tables, cfg, budget=None, web_store_dir=store)
    else:
        tables = {
            n: pq.read_table(os.path.join(fdir, f"{n}.parquet"))
            for n in ("seeds", "web", "hosts", "documents")
        }
        pipe = CrawlPipeline(tables, CrawlConfig(), budget=None)
    t0 = time.time()
    total = 0
    samples: list[tuple[int, int, float]] = []
    while True:
        n = pipe.run_round()
        if n == 0:
            break
        total += n
        r = rss_mib()
        samples.append((pipe.round, total, r))
        print(
            f"round={pipe.round:3d} fetches={n:8d} cumulative={total:8d} "
            f"rss_mib={r:9.1f}",
            flush=True,
        )
    wall = time.time() - t0
    # flatness: RSS at the end vs at the first round that crawled ≥10% of
    # the eventual total — driver memory must not scale with fetched volume
    base = next((r for _rnd, cum, r in samples if cum >= total * 0.1), samples[0][2])
    final = samples[-1][2]
    print(
        f"SUMMARY scale={scale} fetches={total} rounds={pipe.round} "
        f"wall_s={wall:.1f} rss_base_mib={base:.1f} rss_final_mib={final:.1f} "
        f"growth_ratio={final / max(base, 1):.3f}"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
