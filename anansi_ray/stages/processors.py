"""Payload processors — the name-registered ``process()`` implementations
(SURVEY.md §2.11; libspider.h:156-162).

The reference ships two: ``rdf`` (parse + link extraction,
processors/rdf.c) and ``lod`` (rdf wrapped with the license filter,
processors/lod.c:57-87 installs ``lod_rdf_filter`` as the rdf processor's
model filter).  Crucially the lod filter runs BEFORE link collection
(rdf.c:311-320), so a license-rejected document contributes no frontier
links.

Both functions share the signature
``(payload, url, content_type, link_values, content_location, cfg)
-> (CrawlState, out_links, spans)`` and assume the caller already applied
the rdf_preprocess gates (2xx status, known media type — rdf.c:161-241),
which are content-family-independent in this engine.
"""

from __future__ import annotations

from anansi_ray.model import CrawlConfig, CrawlState
from anansi_ray.stages.parse import (
    decompose_spans,
    doc_licenses,
    extract_resource_nodes,
    parse_link_headers,
    parse_triples,
)
from anansi_ray.stages.policies import license_policy
from anansi_ray.stages.turtle import TurtleError


def _parse_all(payload, url, content_type, link_values, content_location):
    """Payload triples + Link-header triples (rdf_process_headers runs
    before filtering/extraction, rdf.c:305-309)."""
    triples = parse_triples(payload, content_type, base_url=url) or []
    header_triples = parse_link_headers(link_values, url, content_location or None)
    return triples, triples + header_triples


def process_rdf(
    payload, url, content_type, link_values, content_location, cfg: CrawlConfig
):
    """The plain ``rdf`` processor: parse, extract resource-node links,
    decompose spans; malformed payload ⇒ COS_ERR ⇒ FAILED (rdf.c:295-300)."""
    try:
        triples, all_triples = _parse_all(
            payload, url, content_type, link_values, content_location
        )
    except TurtleError:
        return CrawlState.FAILED, [], None
    return (
        CrawlState.ACCEPTED,
        extract_resource_nodes(all_triples),
        decompose_spans(triples, url),
    )


import re

_HREF = re.compile(
    r"""<(?:a|link|area)\b[^>]*?\bhref\s*=\s*["']([^"'>\s]+)["']|"""
    r"""<(?:img|script|iframe|source|audio|video)\b[^>]*?\bsrc\s*=\s*["']([^"'>\s]+)["']""",
    re.I,
)


def process_html(
    payload, url, content_type, link_values, content_location, cfg: CrawlConfig
):
    """The ``html`` processor (M14): anchor/resource link extraction from
    HTML payloads — the reference sketches this in its crawl-mirror example
    (utils/crawl-mirror.c:265-291, a libxml2 anchor-recursion stub); here a
    compiled-regex extractor with in-document first-occurrence dedup
    (matching the M13 dedup rule) plus the RFC 5988 Link headers.  No RDF
    model ⇒ no interleaved spans."""
    text = (
        payload.decode("utf-8", "replace")
        if isinstance(payload, (bytes, bytearray))
        else (payload or "")
    )
    seen: dict[str, None] = {}
    for m in _HREF.finditer(text):
        target = m.group(1) or m.group(2)
        if target and target not in seen:
            seen[target] = None
    for _s, _p, o, is_res in parse_link_headers(
        link_values, url, content_location or None
    ):
        if is_res and o not in seen:
            seen[o] = None
    return CrawlState.ACCEPTED, list(seen), None


def _accepts_html(content_type: str | None) -> bool:
    from anansi_ray.canon import normalize_content_type

    return normalize_content_type(content_type) in ("text/html", "application/xhtml+xml")


process_html.accepts = _accepts_html


def process_lod(
    payload, url, content_type, link_values, content_location, cfg: CrawlConfig
):
    """The ``lod`` processor: rdf + license filter (lod.c:57-231).  The
    filter verdict lands BEFORE link collection (rdf.c:311-320)."""
    try:
        triples, all_triples = _parse_all(
            payload, url, content_type, link_values, content_location
        )
    except TurtleError:
        return CrawlState.FAILED, [], None
    if not license_policy(
        doc_licenses(all_triples, url, content_location or None), cfg
    ):
        return CrawlState.REJECTED, [], None
    return (
        CrawlState.ACCEPTED,
        extract_resource_nodes(all_triples),
        decompose_spans(triples, url),
    )
