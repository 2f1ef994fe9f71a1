"""Payload parsing, link extraction and span decomposition (M10-M15).

Re-expresses the reference's librdf-based processor chain
(/root/reference/libspider/processors/rdf.c) as pure, vectorizable batch
functions:

* media-type → parser dispatch (rdf.c:208-239)               — ``parse_triples``
* RDF parse (rdf.c:282-300)                                  — N-Triples /
  N-Quads line parser + a lite RDF/XML parser (regex-based; no external XML
  libs in this container)
* RFC 5988 ``Link:`` header → triples (rdf.c:338-599)        — ``parse_link_headers``
* link extraction: every resource-node URI in subject/predicate/object
  position, deduped in document order (rdf.c:270-328, 601-635)
  — ``extract_resource_nodes``
* span decomposition (M15, engine target model)              — ``decompose_spans``

All functions are stateless; the batch kernel ``parse_batch`` is intended for
``Dataset.map_batches(batch_format="pyarrow")`` downstream of the fetch stage.
"""

from __future__ import annotations

import re

from anansi_ray.canon import normalize_content_type
from anansi_ray.model import RDF_PARSER_BY_TYPE

AN = "http://anansi.example/v#"
XHTML_VOCAB = "http://www.w3.org/1999/xhtml/vocab#"

# triple: (subject, predicate, object, object_is_resource)
Triple = tuple[str, str, str, bool]

_NT_LINE = re.compile(
    r"^<([^>\s]+)>\s+<([^>\s]+)>\s+"
    r'(?:<([^>\s]+)>|"((?:[^"\\]|\\.)*)"(?:\^\^<[^>]*>|@[\w-]+)?)'
    r"(?:\s+<[^>\s]+>)?\s*\.\s*$"  # optional graph term (N-Quads), ignored
)

_XML_DESC = re.compile(
    r'<rdf:Description\s+rdf:about="([^"]*)"\s*>(.*?)</rdf:Description>', re.S
)
_XML_PROP = re.compile(
    r'<(\w+):(\w+)(?:\s+rdf:resource="([^"]*)"\s*/>|>([^<]*)</\1:\2>)'
)
_XMLNS = re.compile(r'xmlns:(\w+)="([^"]*)"')


def _unescape_nt(s: str) -> str:
    return s.replace('\\"', '"').replace("\\\\", "\\")


def parse_ntriples(text: str) -> list[Triple]:
    """N-Triples / N-Quads subset parser (graph term dropped)."""
    out: list[Triple] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _NT_LINE.match(line)
        if not m:
            continue
        s, p, o_res, o_lit = m.groups()
        if o_res is not None:
            out.append((s, p, o_res, True))
        else:
            out.append((s, p, _unescape_nt(o_lit or ""), False))
    return out


def parse_rdfxml(text: str) -> list[Triple]:
    """Lite RDF/XML parser: rdf:Description blocks with property children
    that are either ``rdf:resource`` links or text literals.
    """
    ns = dict(_XMLNS.findall(text))
    ns.setdefault("rdf", "http://www.w3.org/1999/02/22-rdf-syntax-ns#")
    out: list[Triple] = []
    for about, body in _XML_DESC.findall(text):
        for prefix, local, res, lit in _XML_PROP.findall(body):
            pred = ns.get(prefix, prefix + ":") + local
            if res:
                out.append((about, pred, res, True))
            else:
                out.append((about, pred, lit, False))
    return out


def parser_for(content_type: str | None) -> str | None:
    """M10 — media type → parser name, or None when unknown (rdf.c:208-239)."""
    return RDF_PARSER_BY_TYPE.get(normalize_content_type(content_type))


def parse_triples(
    payload: bytes | str | None,
    content_type: str | None,
    base_url: str | None = None,
) -> list[Triple] | None:
    """M11 — parse a payload by media type; None when no parser applies.

    ``turtle`` (text/turtle, text/n3) uses the real Turtle parser
    (stages/turtle.py — prefixes, pname expansion, ``;``/``,`` lists, blank
    nodes, collections, typed/lang literals), matching librdf's dispatch
    (rdf.c:208-239); ``ntriples``/``nquads`` keep the regex line parser
    fast path.  A malformed document raises :class:`TurtleError`, which the
    fetch kernel maps to COS_FAILED like librdf's parse failure
    (rdf.c:295-300 → processor.c:200-203).
    """
    name = parser_for(content_type)
    if name is None or payload is None:
        return None
    text = payload.decode("utf-8", "replace") if isinstance(payload, (bytes, bytearray)) else payload
    if name == "turtle":
        from anansi_ray.stages.turtle import parse_turtle

        return parse_turtle(text, base=base_url)
    if name in ("ntriples", "nquads"):
        return parse_ntriples(text)
    if name == "rdfxml":
        return parse_rdfxml(text)
    return None


# ---------------------------------------------------------------------------
# RFC 5988 Link headers → triples (M12, rdf.c:338-599)
# ---------------------------------------------------------------------------

_LINK_VALUE = re.compile(r"<([^>]*)>\s*((?:;[^,<]*)*)")
_LINK_PARAM = re.compile(r';\s*(\w+)\s*=\s*(?:"([^"]*)"|([^;,\s]+))')


def parse_link_headers(
    raw_values: list[str] | None,
    doc_url: str,
    content_location: str | None = None,
) -> list[Triple]:
    """Parse ``Link:`` header values into (subject, rel-URI, target) triples.

    Subject = the ``anchor`` param when present, else the document's
    content-location, else the document URI; bare rel names resolve against
    the XHTML vocab (rdf.c:374-599). Targets/anchors are returned raw —
    canonicalization/resolution happens at enqueue time like every other
    extracted link.
    """
    if not raw_values:
        return []
    default_subject = content_location or doc_url
    out: list[Triple] = []
    for raw in raw_values:
        for m in _LINK_VALUE.finditer(raw):
            target = m.group(1)
            params = {}
            for pm in _LINK_PARAM.finditer(m.group(2) or ""):
                params.setdefault(pm.group(1).lower(), pm.group(2) if pm.group(2) is not None else pm.group(3))
            rels = (params.get("rel") or "related").split()
            subject = params.get("anchor") or default_subject
            for rel in rels:
                rel_uri = rel if ":" in rel else XHTML_VOCAB + rel
                out.append((subject, rel_uri, target, True))
    return out


# ---------------------------------------------------------------------------
# Link extraction + span decomposition
# ---------------------------------------------------------------------------


def extract_resource_nodes(triples: list[Triple]) -> list[str]:
    """M13 — every resource-node URI in s/p/o position, deduped keeping the
    first occurrence in document order (rdf.c:601-635 dedup scan).  Blank
    nodes are not resources and never enqueue (rdf.c:607-611 checks
    ``librdf_node_is_resource``).
    """
    seen: dict[str, None] = {}
    for s, p, o, o_res in triples:
        if s not in seen and not s.startswith("_:"):
            seen[s] = None
        if p not in seen:
            seen[p] = None
        if o_res and o not in seen:
            seen[o] = None
    return list(seen)


_SPAN_SUBJ = re.compile(r"^(.*)#span-(\d+)$")


def decompose_spans(triples: list[Triple], doc_url: str) -> list[dict]:
    """M15 — rebuild the interleaved text+media span sequence from the
    document's span triples; ordered by span index (per-row invariant:
    span-sequence equality on kind/text/media_ref/order).
    """
    by_idx: dict[int, dict] = {}
    for s, p, o, _res in triples:
        m = _SPAN_SUBJ.match(s)
        if not m or m.group(1) != doc_url or not p.startswith(AN):
            continue
        idx = int(m.group(2))
        sp = by_idx.setdefault(
            idx, {"kind": "", "text": "", "media_ref": "", "offset": 0}
        )
        field = p[len(AN):]
        if field == "offset":
            try:
                sp["offset"] = int(o)
            except ValueError:
                pass
        elif field in ("kind", "text", "media_ref"):
            sp[field] = o
    return [by_idx[i] for i in sorted(by_idx)]


def doc_licenses(triples: list[Triple], doc_url: str, content_location: str | None) -> list[str]:
    """License objects asserted on the doc URI *or* its content-location
    (lod.c:139-198 checks both subjects).
    """
    subjects = {doc_url}
    if content_location:
        subjects.add(content_location)
    return [
        o
        for s, p, o, o_res in triples
        if o_res and s in subjects and p == "http://purl.org/dc/terms/license"
    ]
