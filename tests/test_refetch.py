"""Incremental re-crawl (refetch) conformance: TTL-driven re-fetches,
If-Modified-Since → 304 unchanged path (A2), state preservation on 304."""

import pytest

from anansi_ray import fixtures
from anansi_ray.model import CrawlConfig
from anansi_ray.oracle import reference_crawl

REFETCH_CFG = dict(
    ttl_accepted_s=3600,          # ACCEPTED re-fetches after 1 simulated hour
    ttl_unchanged_s=7200,
    refetch_horizon_ms=4 * 3600 * 1000,  # crawl a 4-hour simulated window
)


@pytest.fixture(scope="module")
def tiny():
    return fixtures.generate("tiny", seed=42)


@pytest.fixture(scope="module")
def oracle_run(tiny):
    return reference_crawl(tiny, CrawlConfig(**REFETCH_CFG))


class TestRefetchOracle:
    def test_refetches_happen(self, oracle_run):
        rec = oracle_run["expected_crawl"].to_pylist()
        hashes = [r["url_hash"] for r in rec]
        assert len(hashes) > len(set(hashes))  # some URLs fetched repeatedly

    def test_304_path_exercised(self, oracle_run):
        statuses = oracle_run["expected_crawl"]["status"].to_pylist()
        assert 304 in statuses
        assert 200 in statuses

    def test_304_preserves_state(self, oracle_run):
        rec = oracle_run["expected_crawl"].to_pylist()
        by_hash: dict[str, list] = {}
        for r in rec:
            by_hash.setdefault(r["url_hash"], []).append(r)
        checked = 0
        for rows in by_hash.values():
            for prev, cur in zip(rows, rows[1:]):
                if cur["status"] == 304:
                    assert cur["state"] == prev["state"]
                    checked += 1
        assert checked > 0

    def test_politeness_still_holds(self, tiny, oracle_run):
        from urllib.parse import urlsplit

        rates = {r["host"]: r["rate_ms"] for r in tiny["hosts"].to_pylist()}
        by_host: dict[str, list] = {}
        for r in oracle_run["expected_crawl"].to_pylist():
            by_host.setdefault(urlsplit(r["url"]).hostname, []).append(
                r["fetch_clock_ms"]
            )
        for host, times in by_host.items():
            rate = rates.get(host, 1000)
            times = sorted(times)
            for a, b in zip(times, times[1:]):
                assert b - a >= rate, (host, a, b)


@pytest.mark.usefixtures("ray_session")
def test_refetch_pipeline_conformance(tiny, oracle_run):
    from anansi_ray.pipelines.crawl import CrawlPipeline

    pipe = CrawlPipeline(tiny, CrawlConfig(**REFETCH_CFG)).run()
    exp, got = oracle_run["expected_crawl"], pipe["expected_crawl"]
    assert got.num_rows == exp.num_rows
    for col in ("seq", "fetch_clock_ms", "url_hash", "state", "status"):
        assert got[col].to_pylist() == exp[col].to_pylist(), col
    exp_l = {
        (r["url_hash"], r["state"], r["next_fetch_ms"])
        for r in oracle_run["ledger"].to_pylist()
    }
    got_l = {
        (r["url_hash"], r["state"], r["next_fetch_ms"])
        for r in pipe["ledger"].to_pylist()
    }
    assert got_l == exp_l


@pytest.mark.usefixtures("ray_session")
def test_refetch_with_priority_order_conformance(tiny):
    """Incremental re-crawl under the priority dequeue order: old rows sort
    behind NEW ones, then by link score — pipeline must match the oracle
    through multiple TTL cycles."""
    from anansi_ray.pipelines.crawl import CrawlPipeline

    cfg = CrawlConfig(use_priority=True, **REFETCH_CFG)
    oracle = reference_crawl(tiny, cfg)
    pipe = CrawlPipeline(tiny, cfg).run()
    exp, got = oracle["expected_crawl"], pipe["expected_crawl"]
    assert got.num_rows == exp.num_rows
    for col in ("seq", "fetch_clock_ms", "url_hash", "state", "status"):
        assert got[col].to_pylist() == exp[col].to_pylist(), col
