"""Property-based tests (SURVEY.md §5.4): canonicalization idempotence,
dedup idempotence, politeness/monotonicity invariants on randomized webs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from anansi_ray import fixtures
from anansi_ray.canon import cache_key, canonicalize, shorthash, tinyhash
from anansi_ray.model import CrawlConfig
from anansi_ray.oracle import reference_crawl
from anansi_ray.stages.transitions import transition_batch

_host = st.from_regex(r"[a-z][a-z0-9-]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~%!$&'()*+,;=:@-]{0,8}){0,4}", fullmatch=True)
_frag = st.from_regex(r"(#[A-Za-z0-9]{0,6})?", fullmatch=True)
_urls = st.builds(
    lambda s, h, p, q, f: f"{s}://{h}{p}{q}{f}",
    st.sampled_from(["http", "https", "HTTP", "HtTpS"]),
    _host,
    _path,
    st.sampled_from(["", "?a=1", "?x=%2f&y=2"]),
    _frag,
)


class TestCanonProperties:
    @given(_urls)
    @settings(max_examples=300, deadline=None)
    def test_canonicalize_idempotent(self, url):
        c = canonicalize(url)
        assert c is not None
        assert canonicalize(c) == c

    @given(_urls)
    @settings(max_examples=300, deadline=None)
    def test_fragment_never_survives(self, url):
        c = canonicalize(url)
        assert "#" not in c

    @given(_urls, _urls)
    @settings(max_examples=200, deadline=None)
    def test_cache_key_injective_on_canonical(self, a, b):
        ca, cb = canonicalize(a), canonicalize(b)
        if ca != cb:
            # SHA-256 collision would be a miracle; equal keys ⇒ equal URLs
            assert cache_key(ca) != cache_key(cb)
        else:
            assert cache_key(ca) == cache_key(cb)

    @given(_urls)
    @settings(max_examples=200, deadline=None)
    def test_hash_derivations_consistent(self, url):
        k = cache_key(canonicalize(url))
        assert len(k) == 32 and int(k, 16) >= 0
        assert tinyhash(k) == shorthash(k) % 256
        assert 0 <= tinyhash(k) < 256


class TestTransitionProperties:
    @given(
        st.sampled_from([86400, 604800]),  # A3 base / failed-callback base
        st.integers(0, 599),
        st.booleans(),
        st.integers(0, 10**9),
        st.integers(0, 5),
        st.integers(0, 5),
    )
    @settings(max_examples=300, deadline=None)
    def test_next_fetch_always_future_and_counters_bounded(
        self, ttl_base, status, unchanged, clock, pe, ps
    ):
        tr = transition_batch(
            np.array([ttl_base], dtype=np.int64),
            np.array([status]),
            np.array([unchanged]),
            np.array([clock], dtype=np.int64),
            np.array([pe]),
            np.array([ps]),
            np.array([0], dtype=np.int64),
            CrawlConfig(),
        )
        assert tr["next_fetch_ms"][0] >= clock + 3600 * 1000  # min TTL floor
        assert tr["error_count"][0] in (0, pe, pe + 1)
        assert tr["soft_error_count"][0] in (0, ps, ps + 1)
        assert tr["last_ttl_s"][0] >= 3600


class TestCrawlInvariantsRandomized:
    def _invariants(self, seed):
        tables = fixtures.generate_sized(n_urls=120, n_hosts=6, seed=seed)
        res = reference_crawl(tables, CrawlConfig())
        rec = res["expected_crawl"].to_pylist()
        # single-pass: every URL fetched at most once
        hashes = [r["url_hash"] for r in rec]
        assert len(hashes) == len(set(hashes))
        # politeness per host
        from urllib.parse import urlsplit

        rates = {r["host"]: r["rate_ms"] for r in tables["hosts"].to_pylist()}
        by_host = {}
        for r in rec:
            by_host.setdefault(urlsplit(r["url"]).hostname, []).append(
                r["fetch_clock_ms"]
            )
        for host, times in by_host.items():
            rate = rates.get(host, 1000)
            times.sort()
            for a, b in zip(times, times[1:]):
                assert b - a >= rate
        # seen set ⊇ fetched; ledger rows unique by hash
        led = res["ledger"].to_pylist()
        led_hashes = {r["url_hash"] for r in led}
        assert set(hashes) <= led_hashes
        assert len(led) == len(led_hashes)
        # monotonic next_fetch for fetched rows
        for r in led:
            if r["state"] not in ("NEW", "FORCE"):
                assert r["next_fetch_ms"] > r["updated_ms"]

    def test_seed_1(self):
        self._invariants(1)

    def test_seed_7(self):
        self._invariants(7)

    def test_seed_99(self):
        self._invariants(99)
