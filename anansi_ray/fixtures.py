"""Deterministic synthetic LOD web generator (FIXTURES.md tables 1-4).

Generalizes the reference's single-Turtle-file Apache fixture
(/root/reference/t/wwwroot/index.ttl:1-6 served by t/run-apache-test.sh.in)
into a closed synthetic web large enough to exercise every operator in
SURVEY.md §2.  Everything is generated from ``seed`` — no external data, no
wall-clock.

Tables produced (Arrow):

* ``seeds``      — (url, force); denormalized forms to exercise M1-M4
* ``web``        — one row per fetchable URL; the Fetcher stage looks this
                   table up instead of doing network I/O (S3 analogue)
* ``hosts``      — politeness / robots metadata (≙ crawl_root,
                   /root/reference/libspider/queues/db.c:279-338)
* ``documents``  — ground-truth interleaved text+media spans per
                   would-be-ACCEPTED URL (BASELINE.json input_hint shape)

Payload encoding: spans and out-links are serialized as real RDF triples in
the row's ``content_type`` (N-Triples subset for turtle/ntriples/nquads, a
lite RDF/XML for rdf+xml) so the parse stage genuinely parses by media type
(rdf.c:208-239) and span decomposition (M15) is a real payload operation.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from anansi_ray.canon import cache_key

AN = "http://anansi.example/v#"
DCT_REFS = "http://purl.org/dc/terms/references"
DCT_LICENSE = "http://purl.org/dc/terms/license"
XHTML_VOCAB = "http://www.w3.org/1999/xhtml/vocab#"

LICENSES_OK = (
    "http://creativecommons.org/publicdomain/zero/1.0/",
    "http://creativecommons.org/licenses/by/4.0/",
)
LICENSES_BAD = ("http://example.com/proprietary-license",)

_WORDS = (
    "linked open data crawl frontier spider resource graph triple node "
    "archive media stream fetch cache index shard bucket token host queue"
).split()

#: fixture scale points (FIXTURES.md §6)
SCALES = {
    "tiny": dict(n_urls=200, n_hosts=5),
    "small": dict(n_urls=20_000, n_hosts=50),
    "bench": dict(n_urls=200_000, n_hosts=500),
    # xl exists for the scaling-efficiency measurement: at 200k URLs a
    # 32-way run finishes in ~2 s and fixed overhead dominates the ratio
    "xl": dict(n_urls=1_000_000, n_hosts=2000),
    # xxl (4M URLs) sits BEYOND the broadcast web-table's documented
    # ~10^6-URLs-per-node envelope (sources/webstore.py): pipelines at this
    # size must use the bucketed store (web_store_dir), not the ray.put
    # broadcast the stage bench uses — which is exactly the boundary it
    # exists to demonstrate
    "xxl": dict(n_urls=4_000_000, n_hosts=4000),
    # xxxl (16M URLs, ~27 GB of web rows) can neither be generated nor held
    # driver-side: it exists ONLY through the sharded generator
    # (ensure_sharded_fixture) + the distributed bucketized store — the
    # whole 10^10 shape, one decade down
    "xxxl": dict(n_urls=16_000_000, n_hosts=8000, sharded=True),
}

RDF_TYPES = (
    "text/turtle",
    "application/rdf+xml",
    "application/n-triples",
    "application/n-quads",
)


def _nt_literal(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _spans_for(rng: np.random.Generator, host: str) -> list[dict]:
    n = int(rng.integers(1, 9))
    spans, off = [], 0
    for _ in range(n):
        kind = ["text", "image", "audio", "link"][int(rng.integers(0, 4))]
        text = ""
        media_ref = ""
        if kind == "text":
            k = int(rng.integers(1, 6))
            text = " ".join(_WORDS[int(i)] for i in rng.integers(0, len(_WORDS), k))
        elif kind in ("image", "audio"):
            media_ref = f"media://{host}/m{int(rng.integers(0, 10**9))}"
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
        off += int(rng.integers(1, 100))
    return spans


def _payload_ntriples(url, spans, links, license_uri, quads=False) -> str:
    g = f" <{url}>" if quads else ""
    lines = []
    for i, sp in enumerate(spans):
        s = f"{url}#span-{i}"
        lines.append(f"<{s}> <{AN}kind> {_nt_literal(sp['kind'])}{g} .")
        if sp["text"]:
            lines.append(f"<{s}> <{AN}text> {_nt_literal(sp['text'])}{g} .")
        if sp["media_ref"]:
            lines.append(f"<{s}> <{AN}media_ref> {_nt_literal(sp['media_ref'])}{g} .")
        lines.append(
            f'<{s}> <{AN}offset> "{sp["offset"]}"'
            f"^^<http://www.w3.org/2001/XMLSchema#integer>{g} ."
        )
    for l in links:
        lines.append(f"<{url}> <{DCT_REFS}> <{l}>{g} .")
    if license_uri:
        lines.append(f"<{url}> <{DCT_LICENSE}> <{license_uri}>{g} .")
    return "\n".join(lines) + "\n"


def _ttl_literal(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _payload_turtle(url, spans, links, license_uri) -> str:
    """Real Turtle with @prefix declarations, prefixed names and ``;``/``,``
    predicate/object lists — the shape librdf's turtle parser sees in the
    wild (and the shape of /root/reference/t/wwwroot/index.ttl).  Triple
    emission order matches the N-Triples layout so the M13 extraction
    ground truth (expected_out_links) is identical across serializations."""
    out = [
        f"@prefix v: <{AN}> .",
        "@prefix dct: <http://purl.org/dc/terms/> .",
        "",
    ]
    for i, sp in enumerate(spans):
        out.append(f"<{url}#span-{i}> v:kind {_ttl_literal(sp['kind'])} ;")
        if sp["text"]:
            out.append(f"    v:text {_ttl_literal(sp['text'])} ;")
        if sp["media_ref"]:
            out.append(f"    v:media_ref {_ttl_literal(sp['media_ref'])} ;")
        out.append(f"    v:offset {sp['offset']} .")
    props = []
    if links:
        props.append("dct:references " + ", ".join(f"<{l}>" for l in links))
    if license_uri:
        props.append(f"dct:license <{license_uri}>")
    if props:
        out.append(f"<{url}> " + " ;\n    ".join(props) + " .")
    return "\n".join(out) + "\n"


def _payload_rdfxml(url, spans, links, license_uri) -> str:
    """Full-grammar RDF/XML flavor: scoped ``xml:base`` with RELATIVE
    ``rdf:about`` references (the parser must resolve them — round 2's
    regex parser could not), same triple order as the turtle/ntriples
    flavors so all three share one conformance ground truth."""
    out = [
        '<?xml version="1.0"?>',
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        f' xmlns:v="{AN}" xmlns:dct="http://purl.org/dc/terms/"'
        f' xml:base="{url}">',
    ]
    for i, sp in enumerate(spans):
        out.append(f'<rdf:Description rdf:about="#span-{i}">')
        out.append(f"<v:kind>{sp['kind']}</v:kind>")
        if sp["text"]:
            out.append(f"<v:text>{sp['text']}</v:text>")
        if sp["media_ref"]:
            out.append(f"<v:media_ref>{sp['media_ref']}</v:media_ref>")
        out.append(f"<v:offset>{sp['offset']}</v:offset>")
        out.append("</rdf:Description>")
    out.append('<rdf:Description rdf:about="">')
    for l in links:
        out.append(f'<dct:references rdf:resource="{l}"/>')
    if license_uri:
        out.append(f'<dct:license rdf:resource="{license_uri}"/>')
    out.append("</rdf:Description>")
    out.append("</rdf:RDF>")
    return "\n".join(out) + "\n"


def expected_out_links(url, spans, links, link_pred_prefix, license_uri) -> list[str]:
    """Ground truth of M13 extraction: every resource-node URI
    (subject+predicate+object) in triple order, deduped keeping first
    occurrence (rdf.c:270-328, 601-635).
    """
    seen: dict[str, None] = {}

    def add(u):
        if u not in seen:
            seen[u] = None

    for i, sp in enumerate(spans):
        s = f"{url}#span-{i}"
        add(s)
        add(f"{AN}kind")
        if sp["text"]:
            add(f"{AN}text")
        if sp["media_ref"]:
            add(f"{AN}media_ref")
        add(f"{AN}offset")
    for l in links:
        add(url)
        add(DCT_REFS)
        add(l)
    if license_uri:
        add(url)
        add(DCT_LICENSE)
        add(license_uri)
    return list(seen)


def generate(scale: str = "tiny", seed: int = 42) -> dict[str, pa.Table]:
    """Build the four fixture tables at a named scale point."""
    p = SCALES[scale]
    return generate_sized(n_urls=p["n_urls"], n_hosts=p["n_hosts"], seed=seed)


def generate_sized(n_urls: int, n_hosts: int, seed: int = 42) -> dict[str, pa.Table]:
    rng = np.random.default_rng(seed)

    hosts = [f"h{h}.example.org" for h in range(n_hosts)]
    # 2 hub hosts hold ~50% of URLs (skew, FIXTURES.md §2 / SURVEY §4)
    n_hub = max(1, n_urls // 4)
    host_of_url: list[str] = []
    for i in range(n_urls):
        if n_hosts >= 2 and i < 2 * n_hub:
            host_of_url.append(hosts[i % 2])
        else:
            host_of_url.append(hosts[int(rng.integers(0, n_hosts))])
    urls = []
    for i, h in enumerate(host_of_url):
        path = f"/private/r{i}" if (h == hosts[min(2, n_hosts - 1)] and i % 7 == 0) else f"/r/{i}"
        urls.append(f"http://{h}{path}")
    url_set = set(urls)

    # hosts table -------------------------------------------------------
    rate_ms = np.full(n_hosts, 1000, dtype=np.int32)
    if n_hosts >= 2:
        rate_ms[0] = 250        # fast hub
        rate_ms[1] = 500
    if n_hosts >= 4:
        rate_ms[3] = 2000       # slow host
    if n_hosts >= 5:
        rate_ms[4] = 0          # excluded: dequeue requires rate > 0 (db.c:687)
    robots = [[] for _ in range(n_hosts)]
    if n_hosts >= 3:
        robots[min(2, n_hosts - 1)] = ["/private"]
    hosts_tbl = pa.table(
        {
            "host": hosts,
            "root_hash": [cache_key(f"http://{h}/") for h in hosts],
            "rate_ms": pa.array(rate_ms, pa.int32()),
            "robots_disallow": pa.array(robots, pa.list_(pa.string())),
            "partition": pa.array(
                [f"p{i % 4}" if i % 3 == 0 else None for i in range(n_hosts)], pa.string()
            ),
        }
    )

    # per-url status / content-type / graph ----------------------------
    status = np.full(n_urls, 200, dtype=np.int32)
    r = rng.random(n_urls)
    status[r < 0.05] = 404
    status[(r >= 0.05) & (r < 0.10)] = 500
    status[(r >= 0.10) & (r < 0.16)] = 301
    status[(r >= 0.16) & (r < 0.20)] = 302

    ctypes = []
    for i in range(n_urls):
        if status[i] >= 300:
            ctypes.append("text/html")
        else:
            rr = rng.random()
            if rr < 0.05:
                ctypes.append("text/html; charset=utf-8")  # unknown → SKIPPED (F6)
            elif rr < 0.08:
                ctypes.append("application/octet-stream")  # unknown → SKIPPED
            else:
                ct = RDF_TYPES[int(rng.integers(0, len(RDF_TYPES)))]
                ctypes.append(ct + "; charset=utf-8" if rng.random() < 0.3 else ct)

    redirect = [None] * n_urls
    for i in range(n_urls):
        if status[i] in (301, 302):
            redirect[i] = urls[int(rng.integers(0, n_urls))]

    content_location = [None] * n_urls
    for i in range(n_urls):
        if status[i] == 200 and rng.random() < 0.15:
            if rng.random() < 0.3:  # cross-origin → must be dropped (fetch.c:372-413)
                content_location[i] = f"http://other{i % 7}.example.net/cl/{i}"
            else:
                content_location[i] = f"http://{host_of_url[i]}/cl/{i}"

    link_headers: list[list[str]] = [[] for _ in range(n_urls)]
    for i in range(n_urls):
        if status[i] == 200 and rng.random() < 0.2:
            tgt = urls[int(rng.integers(0, n_urls))]
            if rng.random() < 0.5:
                link_headers[i].append(f'<{tgt}>; rel="describedby"')
            else:
                link_headers[i].append(f"<{tgt}>; rel=next")  # bare rel → xhtml vocab
        if status[i] == 200 and rng.random() < 0.05:
            tgt = urls[int(rng.integers(0, n_urls))]
            anchor = urls[int(rng.integers(0, n_urls))]
            link_headers[i].append(f'<{tgt}>; rel="alternate"; anchor="{anchor}"')

    # link graph: out-degree ~3, 70% same-host bias
    same_host_urls: dict[str, list[str]] = {}
    for u, h in zip(urls, host_of_url):
        same_host_urls.setdefault(h, []).append(u)

    payloads: list[bytes | None] = [None] * n_urls
    out_links_col: list[list[str]] = [[] for _ in range(n_urls)]
    spans_col: list[list[dict] | None] = [None] * n_urls
    licenses: list[str | None] = [None] * n_urls

    for i in range(n_urls):
        if status[i] != 200:
            continue
        nl = int(rng.poisson(3))
        links = []
        for _ in range(nl):
            if rng.random() < 0.7:
                pool = same_host_urls[host_of_url[i]]
                links.append(pool[int(rng.integers(0, len(pool)))])
            else:
                links.append(urls[int(rng.integers(0, n_urls))])
        # a few denormalized forms to exercise canonicalization on enqueue
        if links and rng.random() < 0.2:
            u = links[0]
            links[0] = u.replace("http://", "HTTP://", 1).replace(
                "://", "://", 1
            ) + "#frag"
        lic = None
        rr = rng.random()
        if rr < 0.5:
            lic = LICENSES_OK[int(rng.integers(0, len(LICENSES_OK)))]
        elif rr < 0.6:
            lic = LICENSES_BAD[0]
        licenses[i] = lic
        ct = ctypes[i].split(";")[0].strip()
        spans = _spans_for(rng, host_of_url[i])
        if ct == "text/turtle":
            payloads[i] = _payload_turtle(urls[i], spans, links, lic).encode()
        elif ct == "application/n-triples":
            payloads[i] = _payload_ntriples(urls[i], spans, links, lic).encode()
        elif ct == "application/n-quads":
            payloads[i] = _payload_ntriples(urls[i], spans, links, lic, quads=True).encode()
        elif ct == "application/rdf+xml":
            payloads[i] = _payload_rdfxml(urls[i], spans, links, lic).encode()
        else:
            payloads[i] = b"<html><body>not rdf</body></html>"
            spans = None
        spans_col[i] = spans
        if spans is not None:
            out_links_col[i] = expected_out_links(urls[i], spans, links, AN, lic)

    # raw response header blocks (M5/S4/M8): the wire form every fetch
    # parses under the 8 KiB cap (fetch.c:28, 497-552).  Built from the
    # structured columns, which stay as ground truth; formatting variety
    # (name case, missing space after colon, colon-less lines, repeated
    # headers) exercises the parser's reference edge rules.
    _REASON = {
        200: "OK",
        301: "Moved Permanently",
        302: "Found",
        404: "Not Found",
        500: "Internal Server Error",
    }
    raw_headers: list[str] = []
    for i in range(n_urls):
        lines = [f"HTTP/1.1 {status[i]} {_REASON.get(int(status[i]), 'Status')}"]
        if ctypes[i]:
            name = "content-type" if i % 9 == 0 else "Content-Type"
            sep = ":" if i % 11 == 0 else ": "  # exactly-one-space rule
            lines.append(f"{name}{sep}{ctypes[i]}")
        if redirect[i]:
            lines.append(f"Location: {redirect[i]}")
        if content_location[i]:
            lines.append(f"Content-Location: {content_location[i]}")
        for lh in link_headers[i]:
            lines.append(f"Link: {lh}")
        lines.append("SERVER: anansi-fixture/1.0" if i % 5 == 0 else "Server: anansi-fixture/1.0")
        lines.append(f"X-Fixture-Seq: {i}")
        if i % 7 == 0:
            lines.append(f"X-Fixture-Seq: {i + 1}")  # repeated header → array
        if i % 13 == 0:
            lines.append("malformed-noncolon-line")  # skipped by the parser
        raw_headers.append("\r\n".join(lines) + "\r\n\r\n")

    # last_modified drives the If-Modified-Since / 304 path (fetch.c:89-95):
    # ~30% of pages were "modified long ago" (tiny offset ⇒ unchanged on
    # re-fetch ⇒ 304); the rest carry large offsets (changed ⇒ fresh refetch)
    lm_offset_ms = rng.integers(0, 10**9, n_urls)
    stale = rng.random(n_urls) < 0.3
    lm_offset_ms[stale] = rng.integers(0, 5000, int(stale.sum()))
    last_modified = (
        np.datetime64("2020-01-01T00:00:00", "us")
        + lm_offset_ms * np.timedelta64(1000, "us")
    )

    from anansi_ray.model import SPAN_TYPE

    web = pa.table(
        {
            "url": urls,
            "host": host_of_url,
            "status": pa.array(status, pa.int32()),
            "content_type": ctypes,
            "redirect": pa.array(redirect, pa.string()),
            "content_location": pa.array(content_location, pa.string()),
            "link_headers": pa.array(link_headers, pa.list_(pa.string())),
            "raw_headers": pa.array(raw_headers, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "out_links": pa.array(out_links_col, pa.list_(pa.string())),
            "license": pa.array(licenses, pa.string()),
            "last_modified": pa.array(last_modified, pa.timestamp("us")),
        }
    )

    # ground-truth interleaved documents table (input_hint shape)
    doc_ids, doc_spans = [], []
    for i in range(n_urls):
        if spans_col[i] is not None:
            doc_ids.append(cache_key(urls[i]))
            doc_spans.append(spans_col[i])
    documents = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(doc_spans, pa.list_(SPAN_TYPE)),
        }
    )

    # seeds: hubs + a few random, with denormalized forms + one force row
    n_seeds = min(8, n_urls)
    seed_idx = sorted(set([0, 1] + [int(x) for x in rng.integers(0, n_urls, n_seeds)]))
    seed_urls, force = [], []
    for j, i in enumerate(seed_idx):
        u = urls[i]
        if j % 3 == 1:
            u = u.replace("http://h", "HTTP://H", 1) + "#top"
        elif j % 3 == 2:
            u = u.replace(".example.org/", ".example.org:80/", 1)
        seed_urls.append(u)
        force.append(j == 0)
    seeds = pa.table({"url": seed_urls, "force": force})

    return {"seeds": seeds, "web": web, "hosts": hosts_tbl, "documents": documents}


def write_fixture(tables: dict[str, pa.Table], out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, tbl in tables.items():
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))


def ensure_fixture(scale: str, base_dir: str = "/tmp/anansi_fixtures", seed: int = 42) -> str:
    """Generate-once cache of a fixture scale under /tmp; returns its dir."""
    if SCALES.get(scale, {}).get("sharded"):
        return ensure_sharded_fixture(scale, base_dir, seed)
    # v4: rdfxml payloads use xml:base + relative rdf:about
    out = os.path.join(base_dir, f"{scale}_s{seed}_v4")
    marker = os.path.join(out, "_COMPLETE")
    if not os.path.exists(marker):
        write_fixture(generate(scale, seed), out)
        with open(marker, "w") as f:
            f.write("ok")
    return out


# ---------------------------------------------------------------------------
# Sharded generation (xxxl+): the web is too big to build or hold on the
# driver, so host/url assignment becomes a closed FORMULA over the global
# index (no global RNG sequence) and each index range generates + writes its
# own parquet shard in a Ray task.  Same row schema, same payload builders,
# same status/content-type mixes as generate_sized — the only semantic
# difference is the (documented) formula host assignment.
# ---------------------------------------------------------------------------


def _hub_count(n_urls: int) -> int:
    return max(1, n_urls // 4)


def _host_index_of(i: int, n_urls: int, n_hosts: int) -> int:
    """Closed-form host assignment: hosts 0/1 are hubs holding the first
    half of the index space (the skew of FIXTURES.md §2); the rest
    round-robin over hosts[2:] — invertible, so same-host link sampling
    needs no host→urls pool."""
    n_hub = _hub_count(n_urls)
    if n_hosts >= 2 and i < 2 * n_hub:
        return i % 2
    if n_hosts <= 2:
        return i % n_hosts
    return 2 + (i - 2 * n_hub) % (n_hosts - 2)


def _url_of_index(i: int, n_urls: int, n_hosts: int) -> str:
    h = _host_index_of(i, n_urls, n_hosts)
    path = f"/private/r{i}" if (h == min(2, n_hosts - 1) and i % 7 == 0) else f"/r/{i}"
    return f"http://h{h}.example.org{path}"


def _same_host_peer(h: int, k: int, n_urls: int, n_hosts: int) -> int:
    """k-th index living on host h (inverse of _host_index_of)."""
    n_hub = _hub_count(n_urls)
    if n_hosts >= 2 and h < 2:
        return 2 * (k % n_hub) + h
    if n_hosts <= 2:
        return (k * n_hosts + h) % n_urls
    base = 2 * n_hub + (h - 2)
    if base >= n_urls:  # host has no non-hub URLs at this scale
        return k % (2 * n_hub)
    count = max(1, (n_urls - base + (n_hosts - 2) - 1) // (n_hosts - 2))
    return base + (n_hosts - 2) * (k % count)


def _gen_web_shard(
    lo: int, hi: int, n_urls: int, n_hosts: int, seed: int, out_path: str
) -> int:
    """Generate web rows for global indexes [lo, hi) and write one parquet
    shard; deterministic from (seed, lo).  Returns the row count."""
    rng = np.random.default_rng([seed, lo])
    n = hi - lo
    idx = range(lo, hi)
    urls = [_url_of_index(i, n_urls, n_hosts) for i in idx]
    host_of_url = [
        f"h{_host_index_of(i, n_urls, n_hosts)}.example.org" for i in idx
    ]

    status = np.full(n, 200, dtype=np.int32)
    r = rng.random(n)
    status[r < 0.05] = 404
    status[(r >= 0.05) & (r < 0.10)] = 500
    status[(r >= 0.10) & (r < 0.16)] = 301
    status[(r >= 0.16) & (r < 0.20)] = 302

    ctypes = []
    for j in range(n):
        if status[j] >= 300:
            ctypes.append("text/html")
        else:
            rr = rng.random()
            if rr < 0.05:
                ctypes.append("text/html; charset=utf-8")
            elif rr < 0.08:
                ctypes.append("application/octet-stream")
            else:
                ct = RDF_TYPES[int(rng.integers(0, len(RDF_TYPES)))]
                ctypes.append(ct + "; charset=utf-8" if rng.random() < 0.3 else ct)

    redirect: list[str | None] = [None] * n
    for j in range(n):
        if status[j] in (301, 302):
            redirect[j] = _url_of_index(
                int(rng.integers(0, n_urls)), n_urls, n_hosts
            )

    content_location: list[str | None] = [None] * n
    for j, i in enumerate(idx):
        if status[j] == 200 and rng.random() < 0.15:
            if rng.random() < 0.3:
                content_location[j] = f"http://other{i % 7}.example.net/cl/{i}"
            else:
                content_location[j] = f"http://{host_of_url[j]}/cl/{i}"

    link_headers: list[list[str]] = [[] for _ in range(n)]
    for j in range(n):
        if status[j] == 200 and rng.random() < 0.2:
            tgt = _url_of_index(int(rng.integers(0, n_urls)), n_urls, n_hosts)
            if rng.random() < 0.5:
                link_headers[j].append(f'<{tgt}>; rel="describedby"')
            else:
                link_headers[j].append(f"<{tgt}>; rel=next")
        if status[j] == 200 and rng.random() < 0.05:
            tgt = _url_of_index(int(rng.integers(0, n_urls)), n_urls, n_hosts)
            anchor = _url_of_index(int(rng.integers(0, n_urls)), n_urls, n_hosts)
            link_headers[j].append(f'<{tgt}>; rel="alternate"; anchor="{anchor}"')

    payloads: list[bytes | None] = [None] * n
    out_links_col: list[list[str]] = [[] for _ in range(n)]
    licenses: list[str | None] = [None] * n
    for j, i in enumerate(idx):
        if status[j] != 200:
            continue
        nl = int(rng.poisson(3))
        links = []
        h = _host_index_of(i, n_urls, n_hosts)
        for _ in range(nl):
            if rng.random() < 0.7:
                links.append(
                    _url_of_index(
                        _same_host_peer(
                            h, int(rng.integers(0, n_urls)), n_urls, n_hosts
                        ),
                        n_urls,
                        n_hosts,
                    )
                )
            else:
                links.append(
                    _url_of_index(int(rng.integers(0, n_urls)), n_urls, n_hosts)
                )
        if links and rng.random() < 0.2:
            links[0] = links[0].replace("http://", "HTTP://", 1) + "#frag"
        lic = None
        rr = rng.random()
        if rr < 0.5:
            lic = LICENSES_OK[int(rng.integers(0, len(LICENSES_OK)))]
        elif rr < 0.6:
            lic = LICENSES_BAD[0]
        licenses[j] = lic
        ct = ctypes[j].split(";")[0].strip()
        spans = _spans_for(rng, host_of_url[j])
        if ct == "text/turtle":
            payloads[j] = _payload_turtle(urls[j], spans, links, lic).encode()
        elif ct == "application/n-triples":
            payloads[j] = _payload_ntriples(urls[j], spans, links, lic).encode()
        elif ct == "application/n-quads":
            payloads[j] = _payload_ntriples(
                urls[j], spans, links, lic, quads=True
            ).encode()
        elif ct == "application/rdf+xml":
            payloads[j] = _payload_rdfxml(urls[j], spans, links, lic).encode()
        else:
            payloads[j] = b"<html><body>not rdf</body></html>"
            spans = None
        if spans is not None:
            out_links_col[j] = expected_out_links(urls[j], spans, links, AN, lic)

    _REASON = {
        200: "OK",
        301: "Moved Permanently",
        302: "Found",
        404: "Not Found",
        500: "Internal Server Error",
    }
    raw_headers: list[str] = []
    for j, i in enumerate(idx):
        lines = [f"HTTP/1.1 {status[j]} {_REASON.get(int(status[j]), 'Status')}"]
        if ctypes[j]:
            name = "content-type" if i % 9 == 0 else "Content-Type"
            sep = ":" if i % 11 == 0 else ": "
            lines.append(f"{name}{sep}{ctypes[j]}")
        if redirect[j]:
            lines.append(f"Location: {redirect[j]}")
        if content_location[j]:
            lines.append(f"Content-Location: {content_location[j]}")
        for lh in link_headers[j]:
            lines.append(f"Link: {lh}")
        lines.append(
            "SERVER: anansi-fixture/1.0" if i % 5 == 0 else "Server: anansi-fixture/1.0"
        )
        lines.append(f"X-Fixture-Seq: {i}")
        if i % 7 == 0:
            lines.append(f"X-Fixture-Seq: {i + 1}")
        if i % 13 == 0:
            lines.append("malformed-noncolon-line")
        raw_headers.append("\r\n".join(lines) + "\r\n\r\n")

    lm_offset_ms = rng.integers(0, 10**9, n)
    stale = rng.random(n) < 0.3
    lm_offset_ms[stale] = rng.integers(0, 5000, int(stale.sum()))
    last_modified = (
        np.datetime64("2020-01-01T00:00:00", "us")
        + lm_offset_ms * np.timedelta64(1000, "us")
    )

    web = pa.table(
        {
            "url": urls,
            "host": host_of_url,
            "status": pa.array(status, pa.int32()),
            "content_type": ctypes,
            "redirect": pa.array(redirect, pa.string()),
            "content_location": pa.array(content_location, pa.string()),
            "link_headers": pa.array(link_headers, pa.list_(pa.string())),
            "raw_headers": pa.array(raw_headers, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "out_links": pa.array(out_links_col, pa.list_(pa.string())),
            "license": pa.array(licenses, pa.string()),
            "last_modified": pa.array(last_modified, pa.timestamp("us")),
        }
    )
    pq.write_table(web, out_path)
    return n


def ensure_sharded_fixture(
    scale: str,
    base_dir: str = "/tmp/anansi_fixtures",
    seed: int = 42,
    shard_rows: int = 125_000,
) -> str:
    """Generate-once SHARDED fixture: ``web/`` holds one parquet per index
    range (written by parallel Ray tasks, deterministic per (seed, lo));
    ``hosts.parquet``/``seeds.parquet`` stay driver-side (O(#hosts) rows).
    No ``documents.parquet`` — scales this size are throughput evidence,
    not oracle inputs.  Requires a live Ray session (tools/bench own one).
    """
    import ray

    p = SCALES[scale]
    n_urls, n_hosts = p["n_urls"], p["n_hosts"]
    out = os.path.join(base_dir, f"{scale}_s{seed}_v4_sharded")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    web_dir = os.path.join(out, "web")
    os.makedirs(web_dir, exist_ok=True)

    # hosts table: same politeness/robots rules as generate_sized
    hosts = [f"h{h}.example.org" for h in range(n_hosts)]
    rate_ms = np.full(n_hosts, 1000, dtype=np.int32)
    if n_hosts >= 2:
        rate_ms[0] = 250
        rate_ms[1] = 500
    if n_hosts >= 4:
        rate_ms[3] = 2000
    if n_hosts >= 5:
        rate_ms[4] = 0
    robots: list[list[str]] = [[] for _ in range(n_hosts)]
    if n_hosts >= 3:
        robots[min(2, n_hosts - 1)] = ["/private"]
    hosts_tbl = pa.table(
        {
            "host": hosts,
            "root_hash": [cache_key(f"http://{h}/") for h in hosts],
            "rate_ms": pa.array(rate_ms, pa.int32()),
            "robots_disallow": pa.array(robots, pa.list_(pa.string())),
            "partition": pa.array(
                [f"p{i % 4}" if i % 3 == 0 else None for i in range(n_hosts)],
                pa.string(),
            ),
        }
    )
    pq.write_table(hosts_tbl, os.path.join(out, "hosts.parquet"))

    # seeds: hubs + a few formula-spread indexes, denormalized forms
    rng = np.random.default_rng(seed)
    seed_idx = sorted(set([0, 1] + [int(x) for x in rng.integers(0, n_urls, 8)]))
    seed_urls, force = [], []
    for j, i in enumerate(seed_idx):
        u = _url_of_index(i, n_urls, n_hosts)
        if j % 3 == 1:
            u = u.replace("http://h", "HTTP://H", 1) + "#top"
        elif j % 3 == 2:
            u = u.replace(".example.org/", ".example.org:80/", 1)
        seed_urls.append(u)
        force.append(j == 0)
    pq.write_table(
        pa.table({"url": seed_urls, "force": force}),
        os.path.join(out, "seeds.parquet"),
    )

    gen = ray.remote(num_cpus=1)(_gen_web_shard)
    futures = [
        gen.remote(
            lo,
            min(lo + shard_rows, n_urls),
            n_urls,
            n_hosts,
            seed,
            os.path.join(web_dir, f"shard={lo // shard_rows:05d}.parquet"),
        )
        for lo in range(0, n_urls, shard_rows)
    ]
    total = sum(ray.get(futures))
    assert total == n_urls, (total, n_urls)
    with open(marker, "w") as f:
        f.write("ok")
    return out
