"""User-extension registries (§2.11): name-keyed policy/processor
registration and the ≤8-policy chain — a custom policy/processor must plug
into ``process_fetch`` via config alone, without touching engine code
(≙ spider_add_policy / spider_set_processor_name, context.c:822-851,
processor.c:40-67)."""

import pytest

from anansi_ray import registry
from anansi_ray.model import CrawlConfig, CrawlState
from anansi_ray.stages.fetch import process_fetch


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


class TestPolicyRegistry:
    def test_custom_uri_policy_injected_by_name(self):
        registry.register_policy(
            "block-evil",
            uri=lambda url, cfg, ctx: CrawlState.REJECTED if "/evil" in url else None,
        )
        try:
            cfg = CrawlConfig(
                policies=("schemes", "block-evil", "robots", "content-types")
            )
            rec = process_fetch("http://x/evil/a", webrow(), None, cfg)
            assert rec["state"] == CrawlState.REJECTED
            assert rec["ttl_base_s"] == cfg.ttl_failed_s  # failed-callback path
            # non-matching URLs flow through the rest of the chain unchanged
            rec = process_fetch("http://x/good", webrow(), None, cfg)
            assert rec["state"] == CrawlState.ACCEPTED
        finally:
            registry.unregister_policy("block-evil")

    def test_chain_order_first_verdict_wins(self):
        registry.register_policy(
            "always-skip", uri=lambda url, cfg, ctx: CrawlState.SKIPPED
        )
        try:
            cfg = CrawlConfig(policies=("always-skip", "schemes"))
            # schemes would REJECT javascript, but always-skip runs first
            cfg2 = CrawlConfig(
                policies=("always-skip", "schemes"),
                scheme_whitelist=(),
                scheme_blacklist=("javascript",),
            )
            assert (
                process_fetch("javascript://x/", webrow(), None, cfg2)["state"]
                == CrawlState.SKIPPED
            )
            assert (
                process_fetch("http://x/", webrow(), None, cfg)["state"]
                == CrawlState.SKIPPED
            )
        finally:
            registry.unregister_policy("always-skip")

    def test_custom_checkpoint_policy(self):
        registry.register_policy(
            "no-xml",
            checkpoint=lambda status, ct, cfg: (
                (CrawlState.REJECTED, 406)
                if ct and "xml" in ct
                else (None, status)
            ),
        )
        try:
            cfg = CrawlConfig(policies=("schemes", "no-xml", "content-types"))
            rec = process_fetch(
                "http://x/", webrow(content_type="application/rdf+xml"), None, cfg
            )
            assert rec["state"] == CrawlState.REJECTED and rec["status"] == 406
        finally:
            registry.unregister_policy("no-xml")

    def test_chain_length_capped_at_8(self):
        cfg = CrawlConfig(policies=("schemes",) * 9)
        with pytest.raises(ValueError, match="MAX_POLICIES"):
            registry.policy_chain(cfg)

    def test_unknown_policy_name_errors(self):
        cfg = CrawlConfig(policies=("no-such-policy",))
        with pytest.raises(KeyError, match="no-such-policy"):
            registry.policy_chain(cfg)


class TestProcessorRegistry:
    def test_custom_processor_by_name(self):
        def shouty(payload, url, ct, links, cl, cfg):
            return CrawlState.ACCEPTED, ["http://custom.example/"], [
                {"kind": "text", "text": "HI", "media_ref": "", "offset": 0}
            ]

        registry.register_processor("shouty", shouty)
        cfg = CrawlConfig(processor_name="shouty")
        rec = process_fetch("http://x/", webrow(), None, cfg)
        assert rec["out_links"] == ["http://custom.example/"]
        assert rec["spans"][0]["text"] == "HI"

    def test_auto_select_lod_iff_license_filter(self):
        assert registry.get_processor(CrawlConfig()).__name__ == "process_rdf"
        assert (
            registry.get_processor(
                CrawlConfig(license_filter_enabled=True)
            ).__name__
            == "process_lod"
        )

    def test_unknown_processor_errors(self):
        with pytest.raises(KeyError, match="nope"):
            registry.get_processor(CrawlConfig(processor_name="nope"))

    def test_rdf_processor_skips_license_filter(self):
        # plain "rdf" never rejects on license, even with lists configured
        cfg = CrawlConfig(
            processor_name="rdf",
            license_whitelist=("http://only/",),
            license_filter_enabled=True,
        )
        rec = process_fetch("http://x/", webrow(), None, cfg)
        assert rec["state"] == CrawlState.ACCEPTED


class TestHtmlProcessor:
    """M14 — the html processor extracts anchor/resource links from HTML
    payloads (≙ the crawl-mirror example's libxml2 anchor recursion,
    crawl-mirror.c:265-291), selected purely by config."""

    HTML = (
        b"<html><body>"
        b'<a href="/rel/one">one</a>'
        b"<A HREF='http://other.example/two#frag'>two</A>"
        b'<img src="/img/pic.png">'
        b'<a href="/rel/one">dup</a>'
        b"<a href=\"javascript:void(0)x\">js</a>"
        b"</body></html>"
    )

    def test_html_links_extracted_in_doc_order(self):
        cfg = CrawlConfig(processor_name="html")
        rec = process_fetch(
            "http://x/page",
            webrow(content_type="text/html; charset=utf-8", payload=self.HTML),
            None,
            cfg,
        )
        assert rec["state"] == CrawlState.ACCEPTED
        # raw targets, fragment intact — canonicalization (incl. fragment
        # strip) happens at enqueue time like every extracted link
        assert rec["out_links"] == [
            "/rel/one",
            "http://other.example/two#frag",
            "/img/pic.png",
            "javascript:void(0)x",
        ]
        assert rec["spans"] is None  # no RDF model, no interleaved doc

    def test_html_type_gate(self):
        # rdf types are NOT accepted by the html processor and vice versa
        cfg = CrawlConfig(processor_name="html")
        rec = process_fetch(
            "http://x/", webrow(content_type="application/n-triples"), None, cfg
        )
        assert rec["state"] == CrawlState.SKIPPED
        rec = process_fetch(
            "http://x/", webrow(content_type="text/html", payload=self.HTML), None,
            CrawlConfig(),  # default rdf processor
        )
        assert rec["state"] == CrawlState.SKIPPED

    def test_html_link_headers_merged(self):
        cfg = CrawlConfig(processor_name="html")
        rec = process_fetch(
            "http://x/page",
            webrow(
                content_type="text/html",
                payload=b"<a href='/a'>a</a>",
                link_headers=['<http://x/next>; rel="next"'],
            ),
            None,
            cfg,
        )
        assert rec["out_links"] == ["/a", "http://x/next"]


class TestMirrorPrefixPolicy:
    """F8 — the crawl-mirror prefix gate (crawl-mirror.c:119-139), plugged
    into the chain by name."""

    def test_prefix_gate(self):
        cfg = CrawlConfig(
            policies=("mirror-prefix", "schemes", "robots", "content-types"),
            mirror_prefixes=("http://x/site/",),
        )
        ok = process_fetch("http://x/site/page", webrow(), None, cfg)
        assert ok["state"] == CrawlState.ACCEPTED
        off = process_fetch("http://x/other/page", webrow(), None, cfg)
        assert off["state"] == CrawlState.SKIPPED

    def test_non_http_skipped_even_if_prefixed(self):
        from anansi_ray.stages.policies import mirror_prefix_policy

        cfg = CrawlConfig(mirror_prefixes=("ftp://x/",))
        assert mirror_prefix_policy("ftp://x/a", cfg) == CrawlState.SKIPPED

    def test_inert_without_prefixes(self):
        cfg = CrawlConfig(policies=("mirror-prefix", "schemes", "robots", "content-types"))
        assert process_fetch("http://x/a", webrow(), None, cfg)["state"] == CrawlState.ACCEPTED


@pytest.mark.usefixtures("ray_session")
def test_config_local_policy_reaches_ray_workers():
    """Distribution-safe extension: a policy shipped inside the config
    (cfg.extra['policy_objects']) executes inside Ray worker processes
    that never ran register_policy — the whole crawl stays conformant."""
    from anansi_ray import fixtures
    from anansi_ray.oracle import reference_crawl
    from anansi_ray.pipelines.crawl import CrawlPipeline

    block = registry.Policy(
        name="block-r7",
        uri=lambda url, cfg, ctx: (
            CrawlState.REJECTED if url.endswith("/r/7") else None
        ),
    )
    cfg = CrawlConfig(
        policies=("schemes", "block-r7", "robots", "content-types"),
        extra={"policy_objects": {"block-r7": block}},
    )
    tiny = fixtures.generate("tiny", seed=42)
    oracle = reference_crawl(tiny, cfg)
    pipe = CrawlPipeline(tiny, cfg).run()
    exp, got = oracle["expected_crawl"], pipe["expected_crawl"]
    assert got.num_rows == exp.num_rows
    for col in ("seq", "url_hash", "state", "status"):
        assert got[col].to_pylist() == exp[col].to_pylist(), col
    by_url = dict(zip(got["url"].to_pylist(), got["state"].to_pylist()))
    blocked = [u for u in by_url if u.endswith("/r/7")]
    assert blocked and all(by_url[u] == "REJECTED" for u in blocked)


class TestConfigFromFile:
    """SURVEY §2.11 config surface: crawl.conf-shaped INI and JSON both map
    onto CrawlConfig (reference crawler/crawl.conf:1-112)."""

    def test_ini_crawl_conf_shape(self, tmp_path):
        from anansi_ray.model import config_from_file

        p = tmp_path / "crawl.conf"
        p.write_text(
            "[crawler]\n"
            "threads=6\n"
            "[processor]\n"
            "name=lod\n"
            "[policy:schemes]\n"
            "whitelist=http,https\n"
            "blacklist=scp,mailto\n"
            "[policy:content-types]\n"
            "whitelist=text/turtle\n"
            "[lod:licenses]\n"
            'whitelist="http://creativecommons.org/publicdomain/zero/1.0/"\n'
            "[cache]\n"
            "uri=/var/spool/anansi\n"
        )
        cfg = config_from_file(str(p))
        assert cfg.fetch_concurrency == 6
        assert cfg.processor_name == "lod" and cfg.license_filter_enabled
        assert cfg.scheme_whitelist == ("http", "https")
        assert cfg.scheme_blacklist == ("scp", "mailto")
        assert cfg.content_type_whitelist == ("text/turtle",)
        assert cfg.license_whitelist == (
            "http://creativecommons.org/publicdomain/zero/1.0/",
        )
        assert cfg.extra["cache_uri"] == "/var/spool/anansi"

    def test_json_direct_fields(self, tmp_path):
        import json

        from anansi_ray.model import config_from_file

        p = tmp_path / "cfg.json"
        p.write_text(
            json.dumps(
                {
                    "fetch_concurrency": 3,
                    "scheme_whitelist": ["http"],
                    "unknown_key": 1,
                }
            )
        )
        cfg = config_from_file(str(p))
        assert cfg.fetch_concurrency == 3
        assert cfg.scheme_whitelist == ("http",)
        assert cfg.extra["unknown_key"] == 1
