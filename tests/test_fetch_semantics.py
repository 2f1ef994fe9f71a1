"""Unit tests for the fetch/process kernel (S3-S5, M5-M8, F1-F7, C4, A1-A3)."""

import numpy as np
import pytest

from anansi_ray.model import CrawlConfig, CrawlState
from anansi_ray.stages.fetch import is_same_origin, process_fetch
from anansi_ray.stages.policies import (
    content_type_checkpoint,
    license_policy,
    robots_policy,
    scheme_policy,
)
from anansi_ray.stages.transitions import transition_batch

CFG = CrawlConfig()


def webrow(**kw):
    base = {
        "status": 200,
        "content_type": "application/n-triples",
        "redirect": None,
        "content_location": None,
        "link_headers": [],
        "payload": b"<http://a/> <http://p/> <http://b/> .\n",
        "last_modified_ms": 10,
    }
    base.update(kw)
    return base


class TestSameOrigin:
    def test_same(self):
        assert is_same_origin("http://e.com/a", "http://e.com/b")
        assert is_same_origin("http://e.com:80/a", "http://e.com/b")
        assert is_same_origin("https://e.com:443/a", "https://e.com/b")

    def test_different(self):
        assert not is_same_origin("http://e.com/a", "https://e.com/a")
        assert not is_same_origin("http://e.com/a", "http://other.com/a")
        assert not is_same_origin("http://e.com:8080/a", "http://e.com/a")


class TestProcessFetch:
    def test_miss_synthesizes_504(self):
        rec = process_fetch("http://x/", None, None, CFG)
        assert rec["status"] == 504 and rec["state"] == CrawlState.FAILED

    def test_scheme_skipped_and_rejected(self):
        cfg = CrawlConfig(scheme_blacklist=("javascript",))
        assert (
            process_fetch("ftp://x/", webrow(), None, cfg)["state"]
            == CrawlState.SKIPPED
        )
        assert (
            process_fetch("javascript://x/", webrow(), None, cfg)["state"]
            == CrawlState.REJECTED
        )

    def test_robots_rejected_before_lookup(self):
        rec = process_fetch("http://x/private/a", webrow(), ["/private"], CFG)
        assert rec["state"] == CrawlState.REJECTED and rec["status"] == 0

    def test_redirect_skipped_commit_with_canonical_location(self):
        rec = process_fetch(
            "http://x/a",
            webrow(status=301, redirect="../B#frag", content_type="text/html"),
            None,
            CFG,
        )
        assert rec["state"] == CrawlState.SKIPPED_COMMIT
        assert rec["redirect"] == "http://x/B"
        assert rec["status"] == 301

    def test_content_type_whitelist_406(self):
        cfg = CrawlConfig(content_type_whitelist=("text/turtle",))
        rec = process_fetch(
            "http://x/a", webrow(content_type="text/html"), None, cfg
        )
        assert rec["status"] == 406 and rec["state"] == CrawlState.SKIPPED

    def test_content_type_blacklist_406_rejected(self):
        cfg = CrawlConfig(content_type_blacklist=("text/html",))
        rec = process_fetch(
            "http://x/a", webrow(content_type="text/html; charset=x"), None, cfg
        )
        assert rec["status"] == 406 and rec["state"] == CrawlState.REJECTED

    def test_4xx_5xx_failed(self):
        assert (
            process_fetch("http://x/", webrow(status=404), None, CFG)["state"]
            == CrawlState.FAILED
        )
        assert (
            process_fetch("http://x/", webrow(status=500), None, CFG)["state"]
            == CrawlState.FAILED
        )

    def test_unknown_type_skipped_no_links(self):
        rec = process_fetch(
            "http://x/", webrow(content_type="application/octet-stream"), None, CFG
        )
        assert rec["state"] == CrawlState.SKIPPED
        assert rec["out_links"] == [] and rec["spans"] is None

    def test_accepted_with_links(self):
        rec = process_fetch("http://x/", webrow(), None, CFG)
        assert rec["state"] == CrawlState.ACCEPTED and rec["accepted"]
        assert "http://b/" in rec["out_links"]

    def test_304_unchanged(self):
        rec = process_fetch(
            "http://x/", webrow(last_modified_ms=5), None, CFG, prev_updated_ms=100
        )
        assert rec["status"] == 304 and rec["unchanged"] and not rec["fresh"]

    def test_modified_refetch_is_fresh(self):
        rec = process_fetch(
            "http://x/", webrow(last_modified_ms=500), None, CFG, prev_updated_ms=100
        )
        assert rec["status"] == 200 and not rec["unchanged"] and rec["fresh"]

    def test_cross_origin_content_location_dropped(self):
        rec = process_fetch(
            "http://x/a", webrow(content_location="http://other/cl"), None, CFG
        )
        assert rec["content_location"] == ""
        rec = process_fetch(
            "http://x/a", webrow(content_location="/cl"), None, CFG
        )
        assert rec["content_location"] == "http://x/cl"

    def test_license_filter_rejects_unlicensed(self):
        cfg = CrawlConfig(
            license_filter_enabled=True,
            license_whitelist=("http://creativecommons.org/licenses/by/4.0/",),
        )
        rec = process_fetch("http://x/", webrow(), None, cfg)
        assert rec["state"] == CrawlState.REJECTED
        # links still extracted for frontier expansion even when rejected
        assert rec["out_links"]
        lic_payload = (
            b"<http://x/> <http://purl.org/dc/terms/license> "
            b"<http://creativecommons.org/licenses/by/4.0/> .\n"
        )
        rec = process_fetch("http://x/", webrow(payload=lic_payload), None, cfg)
        assert rec["state"] == CrawlState.ACCEPTED


class TestPolicyUnits:
    def test_scheme_case_insensitive(self):
        cfg = CrawlConfig(scheme_whitelist=("HTTP",))
        assert scheme_policy("http://x/", cfg) is None

    def test_robots_disabled(self):
        cfg = CrawlConfig(respect_robots=False)
        assert robots_policy("http://x/private", ["/private"], cfg) is None

    def test_checkpoint_3xx(self):
        st, status = content_type_checkpoint(302, "text/html", CFG)
        assert st == CrawlState.SKIPPED_COMMIT and status == 302

    def test_license_blacklist(self):
        cfg = CrawlConfig(
            license_filter_enabled=True, license_blacklist=("http://bad/",)
        )
        assert not license_policy(["http://bad/"], cfg)
        assert license_policy(["http://ok/"], cfg)  # empty whitelist = allow


class TestTransitions:
    def run1(self, state, status, unchanged=False, prev_err=0, prev_soft=0):
        tr = transition_batch(
            np.array([state], dtype=object),
            np.array([status]),
            np.array([unchanged]),
            np.array([1000], dtype=np.int64),
            np.array([prev_err]),
            np.array([prev_soft]),
            np.array([0], dtype=np.int64),
            CFG,
        )
        return {k: v[0] for k, v in tr.items()}

    def test_accepted_ttl_86400(self):
        r = self.run1("ACCEPTED", 200)
        assert r["last_ttl_s"] == 86400
        assert r["next_fetch_ms"] == 1000 + 86400_000

    def test_skipped_ttl_604800(self):
        assert self.run1("SKIPPED", 200)["last_ttl_s"] == 604800

    def test_failed_4xx_error_count(self):
        r = self.run1("FAILED", 404, prev_err=2)
        assert r["error_count"] == 3 and r["soft_error_count"] == 0
        assert r["last_ttl_s"] >= 86400

    def test_failed_5xx_soft_count(self):
        r = self.run1("FAILED", 504, prev_soft=1)
        assert r["soft_error_count"] == 2 and r["error_count"] == 0

    def test_success_resets_counters(self):
        r = self.run1("ACCEPTED", 200, prev_err=3, prev_soft=2)
        assert r["error_count"] == 0 and r["soft_error_count"] == 0

    def test_unchanged_2h(self):
        r = self.run1("ACCEPTED", 304, unchanged=True, prev_err=1)
        assert r["last_ttl_s"] == 7200 and r["error_count"] == 1

    def test_unchanged_error_7d(self):
        r = self.run1("FAILED", 500, unchanged=True)
        assert r["last_ttl_s"] == 604800

    def test_monotonic_guard(self):
        tr = transition_batch(
            np.array(["ACCEPTED"], dtype=object),
            np.array([200]),
            np.array([False]),
            np.array([1000], dtype=np.int64),
            np.array([0]),
            np.array([0]),
            np.array([10**12], dtype=np.int64),  # prev next_fetch far ahead
            CFG,
        )
        assert tr["next_fetch_ms"][0] == 10**12
