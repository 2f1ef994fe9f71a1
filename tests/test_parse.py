"""Parse stage (M10-M15) + fixture generator consistency tests."""

import pyarrow as pa
import pytest

from anansi_ray import fixtures
from anansi_ray.stages.parse import (
    AN,
    XHTML_VOCAB,
    decompose_spans,
    extract_resource_nodes,
    parse_link_headers,
    parse_ntriples,
    parse_rdfxml,
    parse_triples,
    parser_for,
)


class TestParsers:
    def test_ntriples_basic(self):
        text = (
            '<http://a/> <http://p/> <http://b/> .\n'
            '<http://a/> <http://p2/> "lit val" .\n'
            '<http://a/> <http://p3/> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
            '# comment\n'
            'garbage line\n'
        )
        ts = parse_ntriples(text)
        assert ts == [
            ("http://a/", "http://p/", "http://b/", True),
            ("http://a/", "http://p2/", "lit val", False),
            ("http://a/", "http://p3/", "5", False),
        ]

    def test_ntriples_escaped_quote(self):
        ts = parse_ntriples('<http://a/> <http://p/> "say \\"hi\\"" .')
        assert ts[0][2] == 'say "hi"'

    def test_nquads_graph_dropped(self):
        ts = parse_ntriples("<http://a/> <http://p/> <http://b/> <http://g/> .")
        assert ts == [("http://a/", "http://p/", "http://b/", True)]

    def test_rdfxml_lite(self):
        xml = fixtures._payload_rdfxml(
            "http://e.com/d",
            [{"kind": "text", "text": "hello world", "media_ref": "", "offset": 0}],
            ["http://e.com/other"],
            "http://creativecommons.org/licenses/by/4.0/",
        )
        ts = parse_rdfxml(xml)
        assert ("http://e.com/d#span-0", AN + "kind", "text", False) in ts
        assert ("http://e.com/d#span-0", AN + "text", "hello world", False) in ts
        assert (
            "http://e.com/d",
            "http://purl.org/dc/terms/references",
            "http://e.com/other",
            True,
        ) in ts

    def test_parser_dispatch(self):
        assert parser_for("text/turtle; charset=utf-8") == "turtle"
        assert parser_for("application/rdf+xml") == "rdfxml"
        assert parser_for("text/html") is None
        assert parser_for(None) is None
        assert parse_triples(b"x", "text/html") is None


class TestLinkHeaders:
    def test_quoted_rel(self):
        ts = parse_link_headers(['<http://x/y>; rel="describedby"'], "http://d/")
        assert ts == [("http://d/", XHTML_VOCAB + "describedby", "http://x/y", True)]

    def test_bare_rel_resolved_against_xhtml_vocab(self):
        ts = parse_link_headers(["<http://x>; rel=next"], "http://d/")
        assert ts[0][1] == XHTML_VOCAB + "next"

    def test_absolute_rel_kept(self):
        ts = parse_link_headers(['<http://x>; rel="http://my/rel"'], "http://d/")
        assert ts[0][1] == "http://my/rel"

    def test_anchor_overrides_subject(self):
        ts = parse_link_headers(
            ['<http://x>; rel="alternate"; anchor="http://a/"'], "http://d/"
        )
        assert ts[0][0] == "http://a/"

    def test_content_location_is_default_subject(self):
        ts = parse_link_headers(["<http://x>; rel=up"], "http://d/", "http://cl/")
        assert ts[0][0] == "http://cl/"

    def test_multiple_values_and_rels(self):
        ts = parse_link_headers(
            ['<http://x>; rel="a b", <http://y>; rel=next'], "http://d/"
        )
        assert len(ts) == 3

    def test_empty(self):
        assert parse_link_headers(None, "http://d/") == []
        assert parse_link_headers([], "http://d/") == []


class TestSpans:
    def test_roundtrip(self):
        spans = [
            {"kind": "text", "text": "a b", "media_ref": "", "offset": 0},
            {"kind": "image", "text": "", "media_ref": "media://h/m1", "offset": 7},
            {"kind": "link", "text": "", "media_ref": "", "offset": 12},
        ]
        nt = fixtures._payload_ntriples("http://e/d", spans, [], None)
        got = decompose_spans(parse_ntriples(nt), "http://e/d")
        assert got == spans

    def test_other_doc_spans_ignored(self):
        nt = fixtures._payload_ntriples(
            "http://e/OTHER",
            [{"kind": "text", "text": "x", "media_ref": "", "offset": 0}],
            [],
            None,
        )
        assert decompose_spans(parse_ntriples(nt), "http://e/d") == []


class TestFixtureConsistency:
    """The generator's ground-truth columns must equal what the parse stage
    actually produces — this pins M13/M15 independently of the pipeline."""

    @pytest.fixture(scope="class")
    def tiny(self):
        return fixtures.generate("tiny", seed=42)

    def test_extraction_matches_ground_truth(self, tiny):
        web = tiny["web"]
        docs = {r["doc_id"]: r["spans"] for r in tiny["documents"].to_pylist()}
        from anansi_ray.canon import cache_key

        checked = 0
        for row in web.to_pylist():
            if row["status"] != 200 or parser_for(row["content_type"]) is None:
                continue
            triples = parse_triples(row["payload"], row["content_type"])
            assert triples, row["url"]
            got_links = extract_resource_nodes(triples)
            assert got_links == row["out_links"], row["url"]
            got_spans = decompose_spans(triples, row["url"])
            assert got_spans == docs[cache_key(row["url"])], row["url"]
            checked += 1
        assert checked > 50

    def test_fixture_determinism(self, tiny):
        again = fixtures.generate("tiny", seed=42)
        for name in tiny:
            assert tiny[name].equals(again[name]), name

    def test_fixture_shapes(self, tiny):
        assert tiny["web"].num_rows == 200
        assert tiny["hosts"].num_rows == 5
        assert tiny["seeds"].num_rows >= 3
        assert tiny["documents"].num_rows > 50
        # skew: 2 hub hosts hold ~50%
        hosts = tiny["web"]["host"].to_pylist()
        hub = sum(1 for h in hosts if h in ("h0.example.org", "h1.example.org"))
        assert hub >= tiny["web"].num_rows * 0.4
