"""Edge cases: empty/invalid seeds, unknown hosts, all-error webs."""

import pyarrow as pa
import pytest

from anansi_ray.model import SPAN_TYPE, CrawlConfig
from anansi_ray.oracle import reference_crawl


def _tables(seeds, web_rows, hosts_rows):
    web = pa.table(
        {
            "url": [r[0] for r in web_rows],
            "host": [r[1] for r in web_rows],
            "status": pa.array([r[2] for r in web_rows], pa.int32()),
            "content_type": [r[3] for r in web_rows],
            "redirect": pa.array([r[4] for r in web_rows], pa.string()),
            "content_location": pa.array([None] * len(web_rows), pa.string()),
            "link_headers": pa.array([[] for _ in web_rows], pa.list_(pa.string())),
            "payload": pa.array([r[5] for r in web_rows], pa.binary()),
            "out_links": pa.array([[] for _ in web_rows], pa.list_(pa.string())),
            "license": pa.array([None] * len(web_rows), pa.string()),
            "last_modified": pa.array([0] * len(web_rows), pa.timestamp("us")),
        }
    )
    hosts = pa.table(
        {
            "host": [h[0] for h in hosts_rows],
            "root_hash": ["0" * 32] * len(hosts_rows),
            "rate_ms": pa.array([h[1] for h in hosts_rows], pa.int32()),
            "robots_disallow": pa.array([[] for _ in hosts_rows], pa.list_(pa.string())),
            "partition": pa.array([None] * len(hosts_rows), pa.string()),
        }
    )
    seeds_t = pa.table(
        {"url": [s[0] for s in seeds], "force": [s[1] for s in seeds]}
    )
    docs = pa.table(
        {"doc_id": pa.array([], pa.string()), "spans": pa.array([], pa.list_(SPAN_TYPE))}
    )
    return {"seeds": seeds_t, "web": web, "hosts": hosts, "documents": docs}


@pytest.mark.usefixtures("ray_session")
class TestEdges:
    def test_all_invalid_seeds(self):
        from anansi_ray.pipelines.crawl import CrawlPipeline

        t = _tables([("not a url", False), ("", False)], [], [("h.x", 1000)])
        res = CrawlPipeline(t, CrawlConfig()).run()
        assert res["fetches"] == 0 and res["rounds"] == 0
        assert res["expected_crawl"] is None
        oracle = reference_crawl(t, CrawlConfig())
        assert oracle["expected_crawl"].num_rows == 0

    def test_unknown_host_gets_default_politeness(self):
        from anansi_ray.pipelines.crawl import CrawlPipeline

        nt = b"<http://a/> <http://p/> <http://unknown.example/x> .\n"
        t = _tables(
            [("http://a/", False)],
            [("http://a/", "a", 200, "application/n-triples", None, nt)],
            [("a", 1000)],
        )
        oracle = reference_crawl(t, CrawlConfig())
        pipe = CrawlPipeline(t, CrawlConfig()).run()
        # seed + extracted predicate URI + extracted object URI
        assert pipe["fetches"] == oracle["expected_crawl"].num_rows == 3
        # unknown.example + p host fetched (miss ⇒ 504, committed → SKIPPED)
        states = dict(
            zip(
                pipe["expected_crawl"]["url"].to_pylist(),
                pipe["expected_crawl"]["status"].to_pylist(),
            )
        )
        assert states["http://unknown.example/x"] == 504
        for c in ("seq", "url_hash", "fetch_clock_ms", "state", "status"):
            assert (
                pipe["expected_crawl"][c].to_pylist()
                == oracle["expected_crawl"][c].to_pylist()
            )

    def test_all_errors_no_documents(self):
        from anansi_ray.pipelines.crawl import CrawlPipeline

        t = _tables(
            [("http://a/", False), ("http://b.x/", True)],
            [
                ("http://a/", "a", 404, "text/html", None, None),
                ("http://b.x/", "b.x", 500, "text/html", None, None),
            ],
            [("a", 1000), ("b.x", 1000)],
        )
        res = CrawlPipeline(t, CrawlConfig()).run()
        assert res["fetches"] == 2
        assert res["documents"] is None
        # plain HTTP errors commit fresh and are SKIPPED by the
        # rdf_preprocess gates (rdf.c:169-174), never FAILED
        states = set(res["expected_crawl"]["state"].to_pylist())
        assert states == {"SKIPPED"}
