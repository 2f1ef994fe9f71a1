"""Unit tests for M1-M4 / M9 scalar kernels (SURVEY.md §5.1)."""

import hashlib

import numpy as np
import pytest

from anansi_ray.canon import (
    cache_key,
    canon_batch,
    canonicalize,
    normalize_content_type,
    remove_dot_segments,
    root_of,
    shorthash,
    strip_fragment,
    tinyhash,
)


class TestCanonicalize:
    def test_lowercase_scheme_host(self):
        assert canonicalize("HTTP://WWW.Example.COM/Path") == "http://www.example.com/Path"

    def test_default_port_stripped(self):
        assert canonicalize("http://example.com:80/a") == "http://example.com/a"
        assert canonicalize("https://example.com:443/a") == "https://example.com/a"
        assert canonicalize("http://example.com:8080/a") == "http://example.com:8080/a"

    def test_empty_path_becomes_slash(self):
        assert canonicalize("http://example.com") == "http://example.com/"

    def test_fragment_stripped(self):
        assert canonicalize("http://example.com/a#frag") == "http://example.com/a"

    def test_dot_segments(self):
        assert canonicalize("http://e.com/a/b/../c/./d") == "http://e.com/a/c/d"
        assert canonicalize("http://e.com/../a") == "http://e.com/a"

    def test_query_kept(self):
        assert canonicalize("http://e.com/p?x=1&y=2#f") == "http://e.com/p?x=1&y=2"

    def test_percent_normalization(self):
        # unreserved chars decoded, others uppercased
        assert canonicalize("http://e.com/%7euser/%2fx") == "http://e.com/~user/%2Fx"

    def test_relative_resolution(self):
        assert canonicalize("../b", base="http://e.com/a/c/d") == "http://e.com/a/b"
        assert canonicalize("/root", base="http://e.com/a/c") == "http://e.com/root"
        assert canonicalize("sub", base="http://e.com/a/") == "http://e.com/a/sub"

    def test_invalid(self):
        assert canonicalize("") is None
        assert canonicalize(None) is None
        assert canonicalize("http://") is None
        assert canonicalize("not a url", base=None) is None

    def test_idempotent(self):
        urls = [
            "HTTP://E.com:80/a/../b?q=1#z",
            "https://x.org/%41%7e",
            "http://host/./p/./q",
        ]
        for u in urls:
            c = canonicalize(u)
            assert canonicalize(c) == c


class TestRemoveDotSegments:
    @pytest.mark.parametrize(
        "inp,out",
        [
            ("/a/b/c/./../../g", "/a/g"),
            ("mid/content=5/../6", "mid/6"),
            ("/a/..", "/"),
            ("/a/.", "/a/"),
            ("/..", "/"),
            ("/.", "/"),
            ("", ""),
            ("/a/b/", "/a/b/"),
        ],
    )
    def test_rfc3986_cases(self, inp, out):
        assert remove_dot_segments(inp) == out


class TestCacheKey:
    def test_truncated_sha256(self):
        # cache.c:103-129: SHA-256 of fragment-stripped URI, first 16 bytes hex
        u = "http://example.com/"
        assert cache_key(u) == hashlib.sha256(u.encode()).hexdigest()[:32]
        assert len(cache_key(u)) == 32

    def test_fragment_stripped_before_hash(self):
        assert cache_key("http://e.com/a#x") == cache_key("http://e.com/a")

    def test_shorthash_tinyhash(self):
        k = cache_key("http://example.com/")
        assert shorthash(k) == int(k[:8], 16)
        assert 0 <= shorthash(k) < 2**32
        assert tinyhash(k) == shorthash(k) % 256

    def test_strip_fragment(self):
        assert strip_fragment("http://e.com/a#b#c") == "http://e.com/a"
        assert strip_fragment("http://e.com/a") == "http://e.com/a"


class TestRoot:
    def test_root_derivation(self):
        root_url, root_hash, host = root_of("http://www.bbc.co.uk/iplayer/x?q=1")
        assert root_url == "http://www.bbc.co.uk/"
        assert host == "www.bbc.co.uk"
        assert root_hash == cache_key("http://www.bbc.co.uk/")

    def test_root_keeps_nondefault_port(self):
        root_url, _, host = root_of("http://e.com:8080/a/b")
        assert root_url == "http://e.com:8080/"
        assert host == "e.com"


class TestBatch:
    def test_canon_batch_matches_scalar(self):
        urls = [
            "HTTP://E.com:80/a/../b#z",
            "bogus",
            "https://Hub.example/x",
            "HTTP://E.com:80/a/../b#z",  # repeat → memo path
        ]
        out = canon_batch(urls)
        assert list(out["valid"]) == [True, False, True, True]
        assert out["url"][0] == canonicalize(urls[0]) == "http://e.com/b"
        assert out["url_hash"][0] == cache_key("http://e.com/b")
        assert out["host"][2] == "hub.example"
        assert out["url"][3] == out["url"][0]
        assert out["shorthash"].dtype == np.uint32
        assert out["tinyhash"].dtype == np.uint8

    def test_canon_batch_with_bases(self):
        out = canon_batch(["../x", "/y"], bases=["http://e.com/a/b/", "http://e.com/a"])
        assert out["url"][0] == "http://e.com/a/x"
        assert out["url"][1] == "http://e.com/y"


class TestContentType:
    def test_normalize(self):
        assert normalize_content_type("text/turtle;charset=utf-8") == "text/turtle"
        assert normalize_content_type("  Text/HTML ; q=2") == "text/html"
        assert normalize_content_type(None) == ""
        assert normalize_content_type("") == ""
