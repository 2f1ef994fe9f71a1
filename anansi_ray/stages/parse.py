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


# ---------------------------------------------------------------------------
# RDF/XML (M11) — full W3C grammar subset matching what librdf's parser
# accepts on the reference's dispatch path (rdf.c:208-239, 228-231):
# nested node elements, typed nodes, rdf:about/rdf:ID/rdf:nodeID,
# rdf:resource, parseType Resource/Literal/Collection, property
# attributes, rdf:li, scoped xml:base.  Built on the stdlib expat tree
# (xml.etree) with a from-scratch grammar walk — no external XML libs.
# Literals keep the lexical form (lang/datatype discarded, like the
# Turtle / N-Triples paths).  Malformed XML raises TurtleError (the
# engine's parse-failure signal → COS_FAILED, processor.c:200-203).
# ---------------------------------------------------------------------------

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_R = "{" + RDF_NS + "}"
_XML_NS_BRACE = "{http://www.w3.org/XML/1998/namespace}"
_XML_BASE = _XML_NS_BRACE + "base"
_ABS_REF = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")

#: rdf: attributes that are syntax markers, never property attributes
_SYNTAX_ATTRS = {
    _R + "about",
    _R + "ID",
    _R + "nodeID",
    _R + "resource",
    _R + "parseType",
    _R + "datatype",
    _R + "aboutEach",
    _R + "aboutEachPrefix",
    _R + "bagID",
}


def _tag_uri(tag: str) -> str:
    """'{ns}local' → ns+local (un-namespaced names pass through)."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


class _RdfXml:
    def __init__(self) -> None:
        self.triples: list[Triple] = []
        self._n = 0

    def _bnode(self) -> str:
        self._n += 1
        return f"_:r{self._n}"

    def _emit(self, s: str, p: str, o: str, res: bool) -> None:
        self.triples.append((s, p, o, res))

    @staticmethod
    def _eff_base(el, base: str | None) -> str | None:
        b = el.attrib.get(_XML_BASE)
        if b is None:
            return base
        from urllib.parse import urljoin

        return urljoin(base, b) if base else b

    @staticmethod
    def _resolve(ref: str, base: str | None) -> str:
        # absolute references pass through RAW (urljoin would rewrite the
        # scheme's case) — like every other extracted link, normalization
        # happens at enqueue time (canon.py), not in the parser
        if base is None or _ABS_REF.match(ref):
            return ref
        from urllib.parse import urljoin

        return urljoin(base, ref)

    # -- node elements ---------------------------------------------------
    def node_subject(self, el, base: str | None) -> str:
        base = self._eff_base(el, base)
        a = el.attrib
        if _R + "about" in a:
            return self._resolve(a[_R + "about"], base)
        if _R + "ID" in a:
            return self._resolve("#" + a[_R + "ID"], base)
        if _R + "nodeID" in a:
            return "_:" + a[_R + "nodeID"]
        return self._bnode()

    def node_body(self, el, base: str | None, subj: str) -> None:
        base = self._eff_base(el, base)
        if el.tag != _R + "Description":
            self._emit(subj, RDF_NS + "type", _tag_uri(el.tag), True)
        for k, v in el.attrib.items():
            if k in _SYNTAX_ATTRS or k.startswith(_XML_NS_BRACE) or not k.startswith("{"):
                continue
            if k == _R + "type":
                self._emit(subj, RDF_NS + "type", self._resolve(v, base), True)
            else:
                self._emit(subj, _tag_uri(k), v, False)
        li = 0
        for child in el:
            li = self.property_element(subj, child, base, li)

    def node_element(self, el, base: str | None) -> str:
        subj = self.node_subject(el, base)
        self.node_body(el, base, subj)
        return subj

    # -- property elements ----------------------------------------------
    def property_element(self, subj: str, el, base: str | None, li: int) -> int:
        base = self._eff_base(el, base)
        if el.tag == _R + "li":
            li += 1
            pred = RDF_NS + f"_{li}"
        else:
            pred = _tag_uri(el.tag)
        a = el.attrib
        pt = a.get(_R + "parseType")
        children = list(el)
        if pt == "Resource":
            b = self._bnode()
            self._emit(subj, pred, b, False)
            inner_li = 0
            for child in children:
                inner_li = self.property_element(b, child, base, inner_li)
        elif pt == "Collection":
            if not children:
                self._emit(subj, pred, RDF_NS + "nil", True)
            else:
                cells = [self._bnode() for _ in children]
                self._emit(subj, pred, cells[0], False)
                for i, child in enumerate(children):
                    obj = self.node_subject(child, base)
                    self._emit(cells[i], RDF_NS + "first", obj, not obj.startswith("_:"))
                    if i + 1 < len(cells):
                        self._emit(cells[i], RDF_NS + "rest", cells[i + 1], False)
                    else:
                        self._emit(cells[i], RDF_NS + "rest", RDF_NS + "nil", True)
                    self.node_body(child, base, obj)
        elif pt == "Literal":
            import xml.etree.ElementTree as ET

            lex = (el.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in children
            )
            self._emit(subj, pred, lex, False)
        elif children:
            # nested node element: parent triple first (document-order link
            # extraction), then the node's own triples
            child = children[0]
            obj = self.node_subject(child, base)
            self._emit(subj, pred, obj, not obj.startswith("_:"))
            self.node_body(child, base, obj)
        elif _R + "resource" in a:
            self._emit(subj, pred, self._resolve(a[_R + "resource"], base), True)
        elif _R + "nodeID" in a:
            self._emit(subj, pred, "_:" + a[_R + "nodeID"], False)
        else:
            prop_attrs = [
                (k, v)
                for k, v in a.items()
                if k not in _SYNTAX_ATTRS
                and k.startswith("{")
                and not k.startswith(_XML_NS_BRACE)
                and k != _R + "ID"
            ]
            if prop_attrs:
                # empty property element with property attributes → the
                # object is a fresh bnode carrying them
                b = self._bnode()
                self._emit(subj, pred, b, False)
                for k, v in prop_attrs:
                    if k == _R + "type":
                        self._emit(b, RDF_NS + "type", self._resolve(v, base), True)
                    else:
                        self._emit(b, _tag_uri(k), v, False)
            else:
                # plain literal (rdf:ID reification ids are accepted but not
                # reified — the base triple is still emitted, like raptor's
                # default handling of unused reifications here)
                self._emit(subj, pred, el.text or "", False)
        return li


def parse_rdfxml(text: str, base: str | None = None) -> list[Triple]:
    """M11 — full-grammar RDF/XML → triples (see module notes above)."""
    import xml.etree.ElementTree as ET

    from anansi_ray.stages.turtle import TurtleError

    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise TurtleError(f"rdfxml parse error: {e}") from e
    p = _RdfXml()
    base = p._eff_base(root, base)
    if root.tag == _R + "RDF":
        for child in root:
            p.node_element(child, base)
    else:
        p.node_element(root, base)
    return p.triples


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
        return parse_rdfxml(text, base=base_url)
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
