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
    def test_miss_synthesizes_504_skipped(self):
        # transport error, nothing cached, empty content-type whitelist:
        # commit → updated → rdf_preprocess non-2xx ⇒ SKIPPED with the
        # not-accepted TTL (fetch.c:145-151, rdf.c:169-174)
        rec = process_fetch("http://x/", None, None, CFG)
        assert rec["status"] == 504 and rec["state"] == CrawlState.SKIPPED
        assert rec["ttl_base_s"] == CFG.ttl_not_accepted_s

    def test_miss_with_whitelist_406_failed_path(self):
        # transport error + non-empty whitelist: the checkpoint still runs
        # at commit time with an empty content type ⇒ 406 SKIPPED via the
        # failed callback (ttl 86400, processor.c:261)
        cfg = CrawlConfig(content_type_whitelist=("text/turtle",))
        rec = process_fetch("http://x/", None, None, cfg)
        assert rec["status"] == 406 and rec["state"] == CrawlState.SKIPPED
        assert rec["ttl_base_s"] == cfg.ttl_failed_s

    def test_miss_with_cache_rolls_back_unchanged(self):
        # 504 ≥ 500 with a cached copy ⇒ rollback → unchanged callback
        # (fetch.c:160-171, processor.c:226-240)
        rec = process_fetch("http://x/", None, None, CFG, prev_updated_ms=100)
        assert rec["unchanged"] and not rec["fresh"]

    def test_scheme_skipped_and_rejected(self):
        # empty whitelist: blacklist alone decides (REJECTED); with the
        # default http/https whitelist a blacklisted scheme would be
        # SKIPPED at the whitelist check first (schemes.c:141-168)
        cfg = CrawlConfig(scheme_whitelist=(), scheme_blacklist=("javascript",))
        assert (
            process_fetch("ftp://x/", webrow(), None, CrawlConfig())["state"]
            == CrawlState.SKIPPED
        )
        rec = process_fetch("javascript://x/", webrow(), None, cfg)
        assert rec["state"] == CrawlState.REJECTED
        assert rec["ttl_base_s"] == cfg.ttl_failed_s  # failed-callback path

    def test_whitelist_miss_beats_blacklist_hit(self):
        # whitelist evaluated first (schemes.c:141-168): blacklisted scheme
        # missing from a non-empty whitelist ⇒ SKIPPED, not REJECTED
        cfg = CrawlConfig(
            scheme_whitelist=("http",), scheme_blacklist=("javascript",)
        )
        assert (
            process_fetch("javascript://x/", webrow(), None, cfg)["state"]
            == CrawlState.SKIPPED
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

    def test_4xx_5xx_fresh_are_skipped(self):
        # committed fresh, then rdf_preprocess gates ⇒ SKIPPED (rdf.c:169-174);
        # the reference never marks plain HTTP errors FAILED
        for status in (404, 500):
            rec = process_fetch("http://x/", webrow(status=status), None, CFG)
            assert rec["state"] == CrawlState.SKIPPED, status
            assert rec["fresh"] and not rec["unchanged"]
            assert rec["ttl_base_s"] == CFG.ttl_not_accepted_s

    def test_5xx_with_cache_unchanged(self):
        # ≥500 with a cached copy rolls back to it (fetch.c:160-171)
        rec = process_fetch(
            "http://x/", webrow(status=500), None, CFG, prev_updated_ms=100
        )
        assert rec["unchanged"] and not rec["fresh"]
        assert rec["status"] == 500

    def test_checkpoint_reject_with_cache_unchanged(self):
        # checkpoint reject sets rollback; a cached copy routes it through
        # the unchanged callback (fetch.c:361-366 + 239-246)
        cfg = CrawlConfig(content_type_whitelist=("text/turtle",))
        rec = process_fetch(
            "http://x/",
            webrow(content_type="text/html", last_modified_ms=500),
            None,
            cfg,
            prev_updated_ms=100,
        )
        assert rec["unchanged"] and not rec["fresh"]

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
        # the LOD filter runs BEFORE link collection (rdf.c:311-320):
        # rejected documents contribute no frontier links
        assert rec["out_links"] == []
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
    """Kernel-level tests pinned to the C source, NOT to the shared oracle
    (db.c:944-1126) — the oracle uses this same kernel, so these edges must
    be asserted against the reference's literal branch conditions."""

    def run1(
        self,
        ttl_base,
        status,
        unchanged=False,
        prev_err=0,
        prev_soft=0,
        unchanged_error=False,
        prev_nf=0,
    ):
        tr = transition_batch(
            np.array([ttl_base], dtype=np.int64),
            np.array([status]),
            np.array([unchanged]),
            np.array([1000], dtype=np.int64),
            np.array([prev_err]),
            np.array([prev_soft]),
            np.array([prev_nf], dtype=np.int64),
            CFG,
            unchanged_error=np.array([unchanged_error]),
        )
        return {k: v[0] for k, v in tr.items()}

    def test_accepted_ttl_86400(self):
        r = self.run1(86400, 200)
        assert r["last_ttl_s"] == 86400
        assert r["next_fetch_ms"] == 1000 + 86400_000

    def test_not_accepted_ttl_604800(self):
        assert self.run1(604800, 200)["last_ttl_s"] == 604800

    def test_failed_callback_ttl_floor(self):
        # failed callback passes 86400 (processor.c:261); floor for
        # status != 200 is also 86400 (db.c:962-967)
        assert self.run1(86400, 406)["last_ttl_s"] == 86400

    def test_ok_floor_3600(self):
        # a sub-floor base is raised to 3600 for status 200 (db.c:969-975)
        assert self.run1(60, 200)["last_ttl_s"] == 3600

    def test_4xx_error_count_soft_untouched(self):
        # db.c:1032-1039: [400,499) increments error_count ONLY
        r = self.run1(604800, 404, prev_err=2, prev_soft=3)
        assert r["error_count"] == 3 and r["soft_error_count"] == 3

    def test_5xx_resets_error_increments_soft(self):
        # db.c:1040-1047: [500,599) sets error_count=0, soft+=1
        r = self.run1(604800, 504, prev_err=4, prev_soft=1)
        assert r["error_count"] == 0 and r["soft_error_count"] == 2

    def test_499_599_reset_both(self):
        # reference quirk: 499 and 599 fall through to the else branch
        # (db.c:1032/1040 use < 499 / < 599) — both counters reset
        for status in (499, 599):
            r = self.run1(604800, status, prev_err=2, prev_soft=2)
            assert r["error_count"] == 0 and r["soft_error_count"] == 0, status

    def test_success_resets_counters(self):
        r = self.run1(86400, 200, prev_err=3, prev_soft=2)
        assert r["error_count"] == 0 and r["soft_error_count"] == 0

    def test_unchanged_2h_resets_error(self):
        # db.c:1113-1121: non-error unchanged sets error_count = 0
        r = self.run1(86400, 304, unchanged=True, prev_err=1, prev_soft=2)
        assert r["last_ttl_s"] == 7200
        assert r["error_count"] == 0 and r["soft_error_count"] == 2

    def test_unchanged_error_7d_increments(self):
        # db.c:1101-1111: error unchanged = now+7d, error_count += 1;
        # crawld itself never passes error=1 (processor.c:240) but the
        # queue API exposes it
        r = self.run1(86400, 304, unchanged=True, unchanged_error=True, prev_err=1)
        assert r["last_ttl_s"] == 604800 and r["error_count"] == 2

    def test_unchanged_5xx_is_still_non_error(self):
        # a 5xx rollback arrives via processor.c:240 with error=0:
        # 2h TTL, error_count reset — the status plays no part
        r = self.run1(604800, 500, unchanged=True, prev_err=3, prev_soft=1)
        assert r["last_ttl_s"] == 7200
        assert r["error_count"] == 0 and r["soft_error_count"] == 1

    def test_monotonic_guard_fresh_only(self):
        # db.c:1011-1016 raises next_fetch only on the fresh path...
        r = self.run1(86400, 200, prev_nf=10**12)
        assert r["next_fetch_ms"] == 10**12
        # ...while db_unchanged writes unconditionally (db.c:1113-1121)
        r = self.run1(86400, 304, unchanged=True, prev_nf=10**12)
        assert r["next_fetch_ms"] == 1000 + 7200_000


class TestHeaderBlock:
    """M5/S4/M8 — raw header-block parsing pinned to crawl_generate_info_
    (fetch.c:497-552) and the 8 KiB cap (fetch.c:28, 270-273)."""

    def test_status_line_under_colon_key(self):
        from anansi_ray.stages.fetch import parse_header_block

        h = parse_header_block("HTTP/1.1 200 OK\r\nContent-Type: text/turtle\r\n\r\n")
        assert h[0] == (":", ["HTTP/1.1 200 OK"])
        assert ("Content-Type", ["text/turtle"]) in h

    def test_multi_value_and_case_preserved(self):
        from anansi_ray.stages.fetch import _header_get, parse_header_block

        raw = (
            "HTTP/1.1 200 OK\r\n"
            "Link: <http://a/>; rel=next\r\n"
            "LINK: <http://b/>; rel=prev\r\n"
            "X-N: 1\r\nX-N: 2\r\n\r\n"
        )
        h = parse_header_block(raw)
        # names keep as-sent case as distinct keys (json_object_get is
        # case-sensitive in the reference)...
        assert ("Link", ["<http://a/>; rel=next"]) in h
        assert ("LINK", ["<http://b/>; rel=prev"]) in h
        assert ("X-N", ["1", "2"]) in h
        # ...but extraction lookups are case-insensitive (fetch.c:536-543)
        assert _header_get(h, "link") == [
            "<http://a/>; rel=next",
            "<http://b/>; rel=prev",
        ]

    def test_single_space_skip_rule(self):
        # exactly ONE whitespace char after the colon is trimmed
        # (fetch.c:532-535)
        from anansi_ray.stages.fetch import parse_header_block

        h = parse_header_block("HTTP/1.1 200 OK\nA:v\nB: v\nC:  v\n")
        d = dict(h)
        assert d["A"] == ["v"] and d["B"] == ["v"] and d["C"] == [" v"]

    def test_colonless_lines_skipped(self):
        from anansi_ray.stages.fetch import parse_header_block

        h = parse_header_block("HTTP/1.1 200 OK\nnot a header\nX: 1\n")
        assert dict(h).keys() == {":", "X"}

    def test_cap_exceeded_is_transport_error(self):
        from anansi_ray.stages.fetch import parse_header_block

        big = "HTTP/1.1 200 OK\r\n" + "X-Pad: " + "a" * 9000 + "\r\n\r\n"
        assert parse_header_block(big) is None
        # end-to-end: oversized block behaves like a transport failure
        rec = process_fetch(
            "http://x/", webrow(raw_headers=big), None, CFG
        )
        assert rec["status"] == 504 and rec["state"] == CrawlState.SKIPPED

    def test_fetch_prefers_raw_headers(self):
        # when a raw block is present, status / type / redirect /
        # content-location / Link all come from it
        raw = (
            "HTTP/1.1 301 Moved Permanently\r\n"
            "Content-Type: text/html\r\n"
            "Location: http://x/next\r\n\r\n"
        )
        rec = process_fetch(
            "http://x/a",
            webrow(status=200, content_type="text/turtle", raw_headers=raw),
            None,
            CFG,
        )
        assert rec["status"] == 301
        assert rec["redirect"] == "http://x/next"
        assert rec["state"] == CrawlState.SKIPPED_COMMIT
        assert (":", ["HTTP/1.1 301 Moved Permanently"]) in rec["headers"]

    def test_headers_column_flows_through_batch(self):
        import pyarrow as pa

        from anansi_ray.model import HEADERS_TYPE
        from anansi_ray.stages.fetch import fetch_batch

        web = {
            "http://x/a": webrow(
                raw_headers="HTTP/1.1 200 OK\r\nContent-Type: application/n-triples\r\n\r\n"
            )
        }
        batch = pa.table(
            {
                "url": ["http://x/a"],
                "host": ["x"],
                "state": ["NEW"],
                "status": pa.array([0], pa.int32()),
                "updated_ms": pa.array([0], pa.int64()),
            }
        )
        out = fetch_batch(batch, web, {}, CFG)
        assert out.schema.field("headers").type == HEADERS_TYPE
        hdrs = out["headers"].to_pylist()[0]
        assert (":", ["HTTP/1.1 200 OK"]) in hdrs


class TestHeaderBlockFuzz:
    """Property-based: the header parser never crashes and preserves the
    reference's structural invariants on arbitrary header-shaped input."""

    from hypothesis import given, settings, strategies as st

    _line = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0,
        max_size=40,
    )

    @given(st.lists(_line, min_size=0, max_size=12), st.sampled_from(["\r\n", "\n"]))
    @settings(max_examples=200, deadline=None)
    def test_never_crashes_and_invariants(self, lines, eol):
        from anansi_ray.stages.fetch import parse_header_block

        raw = eol.join(["HTTP/1.1 200 OK"] + lines) + eol
        h = parse_header_block(raw)
        assert h is not None
        d = dict(h)
        # status line under ':'; every other key came from a line WITH a
        # colon; values never carry the EOL
        assert d[":"] == ["HTTP/1.1 200 OK"]
        for k, vals in h:
            assert "\n" not in k and all("\n" not in v and "\r" not in v for v in vals)
            if k != ":":
                assert vals  # at least one value per surviving key

    @given(st.binary(min_size=0, max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_bytes_input_tolerated(self, blob):
        from anansi_ray.stages.fetch import parse_header_block

        parse_header_block(blob)  # must not raise, whatever the bytes
