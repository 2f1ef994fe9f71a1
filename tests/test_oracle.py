"""Oracle crawler invariants (SURVEY.md §5.4 property checks)."""

import pyarrow.compute as pc
import pytest

from anansi_ray import fixtures
from anansi_ray.model import CrawlConfig
from anansi_ray.oracle import reference_crawl


@pytest.fixture(scope="module")
def tiny():
    return fixtures.generate("tiny", seed=42)


@pytest.fixture(scope="module")
def crawl(tiny):
    return reference_crawl(tiny, CrawlConfig(), budget=None)


class TestOracle:
    def test_nonempty_and_terminates(self, crawl):
        assert crawl["rounds"] > 1
        assert crawl["expected_crawl"].num_rows > 50
        assert crawl["documents"].num_rows > 20

    def test_each_url_fetched_once(self, crawl):
        hashes = crawl["expected_crawl"]["url_hash"].to_pylist()
        assert len(hashes) == len(set(hashes))

    def test_politeness_invariant(self, tiny, crawl):
        """No two fetches of one host within rate_ms (simulated)."""
        rates = {r["host"]: r["rate_ms"] for r in tiny["hosts"].to_pylist()}
        from urllib.parse import urlsplit

        by_host = {}
        for r in crawl["expected_crawl"].to_pylist():
            by_host.setdefault(urlsplit(r["url"]).hostname, []).append(
                r["fetch_clock_ms"]
            )
        for host, times in by_host.items():
            rate = rates.get(host, 1000)
            times = sorted(times)
            for a, b in zip(times, times[1:]):
                assert b - a >= rate, (host, a, b, rate)

    def test_rate_zero_host_never_fetched(self, tiny, crawl):
        zero_hosts = {
            r["host"] for r in tiny["hosts"].to_pylist() if r["rate_ms"] <= 0
        }
        assert zero_hosts
        from urllib.parse import urlsplit

        for r in crawl["expected_crawl"].to_pylist():
            assert urlsplit(r["url"]).hostname not in zero_hosts
        # but their URLs stay in the ledger as NEW (seen set includes them)
        led = crawl["ledger"].to_pylist()
        pend = [r for r in led if r["host"] in zero_hosts]
        assert pend and all(r["state"] in ("NEW", "FORCE") for r in pend)

    def test_robots_rejected(self, crawl):
        rej = [
            r
            for r in crawl["expected_crawl"].to_pylist()
            if "/private" in r["url"] and "h2.example.org" in r["url"]
        ]
        assert rej
        assert all(r["state"] == "REJECTED" and r["status"] == 0 for r in rej)

    def test_states_present(self, crawl):
        states = set(crawl["expected_crawl"]["state"].to_pylist())
        # FAILED is deliberately absent: plain HTTP errors are SKIPPED via
        # the rdf_preprocess gates (rdf.c:169-174); FAILED needs an I/O-level
        # commit failure, which the table-backed fetch cannot produce
        assert {"ACCEPTED", "REJECTED", "SKIPPED"} <= states

    def test_seq_is_clock_then_hash(self, crawl):
        rows = crawl["expected_crawl"].to_pylist()
        keys = [(r["fetch_clock_ms"], r["url_hash"]) for r in rows]
        assert keys == sorted(keys)
        assert [r["seq"] for r in rows] == list(range(len(rows)))

    def test_spans_match_ground_truth(self, tiny, crawl):
        truth = {r["doc_id"]: r["spans"] for r in tiny["documents"].to_pylist()}
        got = crawl["documents"].to_pylist()
        assert got
        for d in got:
            assert d["spans"] == truth[d["doc_id"]], d["doc_id"]

    def test_deterministic(self, tiny, crawl):
        again = reference_crawl(tiny, CrawlConfig(), budget=None)
        assert again["expected_crawl"].equals(crawl["expected_crawl"])
        assert again["rounds"] == crawl["rounds"]

    def test_budget_changes_order_not_seen_set(self, tiny, crawl):
        b1 = reference_crawl(tiny, CrawlConfig(), budget=1)
        assert set(b1["expected_crawl"]["url_hash"].to_pylist()) == set(
            crawl["expected_crawl"]["url_hash"].to_pylist()
        )
        assert set(b1["ledger"]["url_hash"].to_pylist()) == set(
            crawl["ledger"]["url_hash"].to_pylist()
        )
        assert b1["rounds"] >= crawl["rounds"]

    def test_next_fetch_monotonic_and_ttl_floors(self, crawl):
        for r in crawl["ledger"].to_pylist():
            if r["state"] in ("NEW", "FORCE"):
                continue
            assert r["next_fetch_ms"] >= r["updated_ms"]
            if r["status"] == 200 and r["state"] == "ACCEPTED":
                assert r["last_ttl_s"] == 86400
            elif r["state"] in ("FAILED", "SKIPPED", "REJECTED"):
                assert r["last_ttl_s"] >= 86400

    def test_error_counters(self, crawl):
        led = {r["url_hash"]: r for r in crawl["ledger"].to_pylist()}
        seen_4xx = seen_5xx = 0
        for r in crawl["expected_crawl"].to_pylist():
            row = led[r["url_hash"]]
            if 400 <= r["status"] < 500:
                assert row["error_count"] == 1
                seen_4xx += 1
            elif r["status"] >= 500:
                assert row["soft_error_count"] == 1
                seen_5xx += 1
        assert seen_4xx and seen_5xx
