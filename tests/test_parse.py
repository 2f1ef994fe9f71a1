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

    def test_rdfxml_full_grammar(self):
        """Table-driven coverage of the W3C grammar features librdf's parser
        accepts on the reference dispatch path (rdf.c:208-239): nested node
        elements, typed nodes, rdf:ID / rdf:nodeID, parseType
        Resource/Literal/Collection, property attributes, rdf:li, xml:base."""
        RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        EX = "http://ex.org/"
        cases = [
            # nested node element: parent triple emitted before child's own
            (
                f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:e="{EX}">'
                f'<rdf:Description rdf:about="{EX}a">'
                f'<e:knows><rdf:Description rdf:about="{EX}b">'
                f"<e:name>Bee</e:name></rdf:Description></e:knows>"
                f"</rdf:Description></rdf:RDF>",
                [
                    (f"{EX}a", f"{EX}knows", f"{EX}b", True),
                    (f"{EX}b", f"{EX}name", "Bee", False),
                ],
            ),
            # typed node element → rdf:type triple first
            (
                f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:e="{EX}">'
                f'<e:Person rdf:about="{EX}a"><e:name>Ann</e:name></e:Person>'
                f"</rdf:RDF>",
                [
                    (f"{EX}a", RDF + "type", f"{EX}Person", True),
                    (f"{EX}a", f"{EX}name", "Ann", False),
                ],
            ),
            # rdf:ID resolves against xml:base; rdf:nodeID is a named bnode
            (
                f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:e="{EX}" xml:base="{EX}doc">'
                f'<rdf:Description rdf:ID="frag"><e:p rdf:nodeID="n1"/>'
                f"</rdf:Description>"
                f'<rdf:Description rdf:nodeID="n1"><e:name>N</e:name>'
                f"</rdf:Description></rdf:RDF>",
                [
                    (f"{EX}doc#frag", f"{EX}p", "_:n1", False),
                    ("_:n1", f"{EX}name", "N", False),
                ],
            ),
            # parseType="Resource": implicit bnode with nested properties
            (
                f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:e="{EX}">'
                f'<rdf:Description rdf:about="{EX}a">'
                f'<e:addr rdf:parseType="Resource"><e:city>Rome</e:city></e:addr>'
                f"</rdf:Description></rdf:RDF>",
                None,  # bnode names are generated; checked structurally below
            ),
            # parseType="Collection": rdf list skeleton
            (
                f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:e="{EX}">'
                f'<rdf:Description rdf:about="{EX}a">'
                f'<e:items rdf:parseType="Collection">'
                f'<rdf:Description rdf:about="{EX}x"/>'
                f'<rdf:Description rdf:about="{EX}y"/>'
                f"</e:items></rdf:Description></rdf:RDF>",
                None,
            ),
            # property attributes on a node element; rdf:li numbering
            (
                f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:e="{EX}">'
                f'<rdf:Description rdf:about="{EX}bag" e:note="hi">'
                f'<rdf:li rdf:resource="{EX}one"/><rdf:li rdf:resource="{EX}two"/>'
                f"</rdf:Description></rdf:RDF>",
                [
                    (f"{EX}bag", f"{EX}note", "hi", False),
                    (f"{EX}bag", RDF + "_1", f"{EX}one", True),
                    (f"{EX}bag", RDF + "_2", f"{EX}two", True),
                ],
            ),
        ]
        for xml, expected in cases:
            ts = parse_rdfxml(xml)
            if expected is not None:
                assert ts == expected, ts

        # structural checks for the bnode-bearing cases
        ts = parse_rdfxml(cases[3][0])
        assert ts[0][0] == f"{EX}a" and ts[0][1] == f"{EX}addr"
        b = ts[0][2]
        assert b.startswith("_:") and ts[0][3] is False
        assert (b, f"{EX}city", "Rome", False) in ts

        ts = parse_rdfxml(cases[4][0])
        first = RDF + "first"
        rest = RDF + "rest"
        nil = RDF + "nil"
        assert ts[0][:2] == (f"{EX}a", f"{EX}items")
        c1 = ts[0][2]
        firsts = [(s, o) for s, p, o, r in ts if p == first]
        assert [o for _s, o in firsts] == [f"{EX}x", f"{EX}y"]
        rests = [(s, o) for s, p, o, r in ts if p == rest]
        assert rests[0][0] == c1 and rests[-1][1] == nil

    def test_rdfxml_parsetype_literal_and_malformed(self):
        RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        EX = "http://ex.org/"
        xml = (
            f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:e="{EX}">'
            f'<rdf:Description rdf:about="{EX}a">'
            f'<e:html rdf:parseType="Literal">pre<e:b>bold</e:b></e:html>'
            f"</rdf:Description></rdf:RDF>"
        )
        ts = parse_rdfxml(xml)
        assert ts[0][1] == f"{EX}html" and "bold" in ts[0][2] and ts[0][3] is False

        from anansi_ray.stages.turtle import TurtleError

        with pytest.raises(TurtleError):
            parse_rdfxml("<rdf:RDF><unclosed>")

    def test_rdfxml_relative_about_xml_base(self):
        """The fixture flavor: xml:base + relative rdf:about ('' and
        '#span-N') must resolve to the same absolute subjects the turtle
        flavor produces."""
        spans = [{"kind": "text", "text": "hello", "media_ref": "", "offset": 0}]
        xml = fixtures._payload_rdfxml("http://e.com/d", spans, ["http://e.com/o"], None)
        ts = parse_rdfxml(xml)
        subs = {s for s, _p, _o, _r in ts}
        assert "http://e.com/d#span-0" in subs and "http://e.com/d" in subs

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


class TestTurtle:
    """Real Turtle parser (M11) — table-driven cases pinned to librdf's
    turtle grammar surface (rdf.c:208-239 dispatches text/turtle and
    text/n3 here)."""

    def test_prefix_only_doc_yields_zero_triples(self):
        # shaped like the reference's own fixture (t/wwwroot/index.ttl:1-6)
        doc = (
            "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
            "@prefix dct: <http://purl.org/dc/terms/> .\n"
        )
        from anansi_ray.stages.turtle import parse_turtle

        assert parse_turtle(doc) == []
        ref = "/root/reference/t/wwwroot/index.ttl"
        import os

        if os.path.exists(ref):
            with open(ref) as f:
                assert parse_turtle(f.read()) == []

    @pytest.mark.parametrize(
        "doc,expected",
        [
            # prefixed names + 'a' keyword
            (
                "@prefix ex: <http://e/> . ex:s a ex:T .",
                [("http://e/s", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://e/T", True)],
            ),
            # SPARQL-style PREFIX (no dot)
            (
                "PREFIX ex: <http://e/>\nex:s ex:p ex:o .",
                [("http://e/s", "http://e/p", "http://e/o", True)],
            ),
            # predicate list ';' and object list ','
            (
                "@prefix e: <http://e/> . e:s e:p e:a, e:b ; e:q \"x\" .",
                [
                    ("http://e/s", "http://e/p", "http://e/a", True),
                    ("http://e/s", "http://e/p", "http://e/b", True),
                    ("http://e/s", "http://e/q", "x", False),
                ],
            ),
            # typed / lang literals keep the lexical form
            (
                '@prefix e: <http://e/> . e:s e:p "5"^^<http://www.w3.org/2001/XMLSchema#int> ; e:q "hi"@en-GB .',
                [
                    ("http://e/s", "http://e/p", "5", False),
                    ("http://e/s", "http://e/q", "hi", False),
                ],
            ),
            # bare numerics and booleans
            (
                "@prefix e: <http://e/> . e:s e:p 42 ; e:q 3.14 ; e:r true .",
                [
                    ("http://e/s", "http://e/p", "42", False),
                    ("http://e/s", "http://e/q", "3.14", False),
                    ("http://e/s", "http://e/r", "true", False),
                ],
            ),
            # @base resolution of relative IRIs
            (
                "@base <http://b.org/dir/> . <x> <p> <../y> .",
                [("http://b.org/dir/x", "http://b.org/dir/p", "http://b.org/y", True)],
            ),
            # blank node label + anonymous property list (inner first)
            (
                "@prefix e: <http://e/> . _:m e:p [ e:q e:o ] .",
                [
                    ("_:b1", "http://e/q", "http://e/o", True),
                    ("_:m", "http://e/p", "_:b1", False),
                ],
            ),
            # long literal with embedded newline + escaped quote
            (
                '@prefix e: <http://e/> . e:s e:p """l1\n"l2""" .',
                [("http://e/s", "http://e/p", 'l1\n"l2', False)],
            ),
            # comments anywhere
            (
                "# top\n@prefix e: <http://e/> . # mid\ne:s e:p e:o . # end",
                [("http://e/s", "http://e/p", "http://e/o", True)],
            ),
            # N-Triples is a Turtle subset
            (
                "<http://a/> <http://p/> <http://b/> .\n",
                [("http://a/", "http://p/", "http://b/", True)],
            ),
        ],
    )
    def test_table_driven(self, doc, expected):
        from anansi_ray.stages.turtle import parse_turtle

        assert parse_turtle(doc) == expected

    def test_collection_emits_rdf_list(self):
        from anansi_ray.stages.turtle import RDF_FIRST, RDF_NIL, RDF_REST, parse_turtle

        got = parse_turtle("@prefix e: <http://e/> . e:s e:p ( e:a e:b ) .")
        firsts = [t for t in got if t[1] == RDF_FIRST]
        rests = [t for t in got if t[1] == RDF_REST]
        assert [t[2] for t in firsts] == ["http://e/a", "http://e/b"]
        assert rests[-1][2] == RDF_NIL

    def test_malformed_raises(self):
        from anansi_ray.stages.turtle import TurtleError, parse_turtle

        for doc in (
            "ex:s ex:p ex:o .",            # undefined prefix
            "@prefix e: <http://e/> . e:s e:p .",  # missing object
            "<http://a/> <http://p/> <http://b/>",  # missing final dot
        ):
            with pytest.raises(TurtleError):
                parse_turtle(doc)

    def test_malformed_payload_maps_to_failed(self):
        # librdf parse failure ⇒ COS_ERR ⇒ FAILED (rdf.c:295-300)
        from anansi_ray.model import CrawlConfig, CrawlState
        from anansi_ray.stages.fetch import process_fetch

        rec = process_fetch(
            "http://x/",
            {
                "status": 200,
                "content_type": "text/turtle",
                "redirect": None,
                "content_location": None,
                "link_headers": [],
                "payload": b"@prefix broken",
                "last_modified_ms": None,
            },
            None,
            CrawlConfig(),
        )
        assert rec["state"] == CrawlState.FAILED
        assert rec["out_links"] == [] and rec["payload"] is not None

    def test_turtle_dispatch_via_content_type(self):
        # text/turtle and text/n3 route to the real parser now
        doc = b"@prefix e: <http://e/> . e:s e:p e:o ."
        for ct in ("text/turtle", "text/n3", "text/turtle; charset=utf-8"):
            got = parse_triples(doc, ct)
            assert got == [("http://e/s", "http://e/p", "http://e/o", True)], ct


class TestTurtleRoundTrip:
    """Property-based: random triple sets serialized to Turtle in varied
    styles (prefixed vs full IRIs, ';'/',' grouping, typed/lang literals,
    long strings) must parse back to exactly the same triples."""

    from hypothesis import given, settings, strategies as st

    _local = st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,8}", fullmatch=True)
    _iri = st.builds(lambda h, p: f"http://{h}.example/{p}", _local, _local)
    _lit = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0,
        max_size=20,
    )
    _triple = st.tuples(_iri, _iri, st.one_of(_iri, _lit), st.booleans())

    @given(
        st.lists(_triple, min_size=0, max_size=12),
        st.integers(0, 3),  # serialization style
    )
    @settings(max_examples=150, deadline=None)
    def test_roundtrip(self, raw, style):
        from anansi_ray.stages.turtle import parse_turtle

        triples = []
        for s, p, o, res_flag in raw:
            is_res = res_flag and o.startswith("http://")
            triples.append((s, p, o, is_res))

        def term(t, is_res):
            if is_res:
                return f"<{t}>"
            esc = t.replace("\\", "\\\\").replace('"', '\\"')
            if style == 2:
                return f'"{esc}"@en'
            if style == 3:
                return f'"{esc}"^^<http://www.w3.org/2001/XMLSchema#string>'
            return f'"{esc}"'

        lines = []
        if style == 1:
            # group by subject with ';' predicate lists
            by_s: dict = {}
            order: list = []
            for s, p, o, r in triples:
                if s not in by_s:
                    by_s[s] = []
                    order.append(s)
                by_s[s].append((p, o, r))
            expected = []
            for s in order:
                po = " ;\n    ".join(
                    f"<{p}> {term(o, r)}" for p, o, r in by_s[s]
                )
                lines.append(f"<{s}> {po} .")
                expected.extend((s, p, o, r) for p, o, r in by_s[s])
        else:
            expected = triples
            for s, p, o, r in triples:
                lines.append(f"<{s}> <{p}> {term(o, r)} .")
        doc = "\n".join(lines) + ("\n" if lines else "")
        assert parse_turtle(doc) == expected
