"""Fetch semantics (S3-S5, M5-M8, F2, F4-F6, C4) + the Ray Fetcher stage.

The reference performs a libcurl GET per record
(/root/reference/libcrawl/fetch.c:51-252); in this sandbox a "fetch" is a
keyed lookup into the synthetic ``web`` fixture table (FIXTURES.md §2).  The
full per-record protocol is kept:

  uri_policy (schemes F1 + robots) → lookup → checkpoint (content-type F2,
  3xx ⇒ SKIPPED_COMMIT) → body → process (parse gates F6, link extraction
  M13, Link headers M12, span decomposition M15, LOD license F7) →
  redirect/content-location extraction with same-origin check (M6/M7,
  fetch.c:372-449) → rollback/unchanged protocol (C4, fetch.c:144-172).

``process_fetch`` is a pure kernel shared by the distributed Fetcher actor
and the single-threaded oracle, so both implement identical per-record
semantics and differ only in scheduling/dedup/merge machinery.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from anansi_ray.canon import canonicalize, DEFAULT_PORTS
from anansi_ray.model import CrawlConfig, CrawlState, SPAN_TYPE, state_name
from anansi_ray.stages.parse import (
    decompose_spans,
    doc_licenses,
    extract_resource_nodes,
    parse_link_headers,
    parse_triples,
    parser_for,
)
from anansi_ray.stages.policies import (
    content_type_checkpoint,
    license_policy,
    robots_policy,
    scheme_policy,
)


def is_same_origin(a: str, b: str) -> bool:
    """M7 — scheme + host + defaulted-port equality (fetch.c:372-413)."""
    pa_, pb = urlsplit(a), urlsplit(b)
    sa, sb = pa_.scheme.lower(), pb.scheme.lower()
    if sa != sb or (pa_.hostname or "").lower() != (pb.hostname or "").lower():
        return False
    try:
        da = pa_.port if pa_.port is not None else DEFAULT_PORTS.get(sa)
        db = pb.port if pb.port is not None else DEFAULT_PORTS.get(sb)
    except ValueError:
        return False
    return da == db


def process_fetch(
    url: str,
    webrow: dict | None,
    robots_disallow,
    cfg: CrawlConfig,
    prev_updated_ms: int | None = None,
) -> dict:
    """Simulate one fetch+process cycle; returns the fetched-record dict.

    ``webrow`` is the matching ``web`` fixture row (None = network miss ⇒
    synthesized 504, fetch.c:148).  ``prev_updated_ms`` is the previous
    successful fetch clock for the If-Modified-Since / 304 path
    (fetch.c:72-95, 160-164).
    """
    rec = {
        "status": 0,
        "content_type": "",
        "redirect": "",
        "content_location": "",
        "payload": None,
        "spans": None,
        "out_links": [],
        "state": CrawlState.FAILED,
        "fresh": True,
        "unchanged": False,
        "accepted": False,
    }

    # pre-fetch URI policies (F1 + robots via the F4 hook)
    st = scheme_policy(url, cfg)
    if st is None:
        st = robots_policy(url, robots_disallow, cfg)
    if st is not None:
        rec["state"] = st
        return rec

    if webrow is None:
        rec["status"] = 504  # synthesized transport error (fetch.c:148)
        rec["state"] = CrawlState.FAILED
        return rec

    status = int(webrow["status"])
    rec["content_type"] = webrow.get("content_type") or ""

    # If-Modified-Since → 304 unchanged path (C4 rollback: not fresh)
    lm = webrow.get("last_modified_ms")
    if (
        prev_updated_ms is not None
        and lm is not None
        and status == 200
        and lm <= prev_updated_ms
    ):
        rec["status"] = 304
        rec["fresh"] = False
        rec["unchanged"] = True
        rec["state"] = CrawlState.SKIPPED
        return rec

    rec["status"] = status

    # checkpoint: content-type policy; 3xx kept for redirect following (F2)
    st, status = content_type_checkpoint(status, rec["content_type"], cfg)
    rec["status"] = status
    if st is not None:
        if st == CrawlState.SKIPPED_COMMIT:
            loc = webrow.get("redirect")
            if loc:
                c = canonicalize(loc, base=url)
                rec["redirect"] = c or ""
            rec["state"] = CrawlState.SKIPPED_COMMIT
        else:
            rec["state"] = st
        return rec

    if status >= 400 or status < 200:
        rec["state"] = CrawlState.FAILED
        return rec

    # same-origin-checked Content-Location (M6/M7, fetch.c:418-449)
    cl = webrow.get("content_location")
    if cl:
        c = canonicalize(cl, base=url)
        if c and is_same_origin(c, url):
            rec["content_location"] = c

    # processing gates (F6): only 2xx with a known RDF type is parsed
    rec["payload"] = webrow.get("payload")
    if parser_for(rec["content_type"]) is None:
        rec["state"] = CrawlState.SKIPPED
        return rec

    triples = parse_triples(rec["payload"], rec["content_type"]) or []
    header_triples = parse_link_headers(
        webrow.get("link_headers"), url, rec["content_location"] or None
    )
    all_triples = triples + header_triples

    rec["out_links"] = extract_resource_nodes(all_triples)
    rec["spans"] = decompose_spans(triples, url)

    if not license_policy(
        doc_licenses(all_triples, url, rec["content_location"] or None), cfg
    ):
        rec["state"] = CrawlState.REJECTED
        return rec

    rec["state"] = CrawlState.ACCEPTED
    rec["accepted"] = True
    return rec


# ---------------------------------------------------------------------------
# Ray Data stage
# ---------------------------------------------------------------------------


#: fixture timestamps are absolute (2020 epoch); the crawl's simulated clock
#: starts at 0, so last_modified is normalized onto the same axis — ms since
#: the fixture's own epoch — making the If-Modified-Since comparison
#: (fetch.c:89-95) meaningful under simulation.
FIXTURE_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z


def _webrow_dicts(tbl: pa.Table) -> dict[str, dict]:
    """Index the web fixture table by canonical URL for O(1) lookup."""
    cols = tbl.to_pydict()
    lm = tbl["last_modified"].cast(pa.int64()).to_pylist()  # µs since epoch
    out = {}
    for i, url in enumerate(cols["url"]):
        out[url] = {
            "status": cols["status"][i],
            "content_type": cols["content_type"][i],
            "redirect": cols["redirect"][i],
            "content_location": cols["content_location"][i],
            "link_headers": cols["link_headers"][i],
            "payload": cols["payload"][i],
            "last_modified_ms": None
            if lm[i] is None
            else (lm[i] - FIXTURE_EPOCH_US) // 1000,
        }
    return out


class Fetcher:
    """Actor-pool fetch+process stage for ``map_batches`` (ST3).

    State loaded ONCE per actor in ``__init__`` (≙ one CRAWL context per
    thread, libcrawl.h:55-61): the broadcast web-table index
    (``ray.put`` handle) and per-host robots lists.  At real scale the web
    index becomes a keyed Lance/parquet lookup; the actor signature and
    batch protocol stay identical.
    """

    def __init__(self, web_ref, robots_ref, cfg: CrawlConfig):
        import ray

        web = ray.get(web_ref) if not isinstance(web_ref, dict) else web_ref
        self.web = web if isinstance(web, dict) else _webrow_dicts(web)
        robots = ray.get(robots_ref) if not isinstance(robots_ref, dict) else robots_ref
        self.robots = robots
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return fetch_batch(batch, self.web, self.robots, self.cfg)


#: per-worker-process broadcast cache: Ray worker processes persist across
#: Dataset executions, so a round loop that launches one execution per round
#: pays the ray.get(web_ref) deserialization once per worker, not per round.
#: (An actor pool would give the same amortization but pays actor startup on
#: every execution; a cached stateless task does not.)
_BROADCAST_CACHE: dict = {}


def _cached_get(ref, convert=None):
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    val = _BROADCAST_CACHE.get(key)
    if val is None:
        val = ray.get(ref)
        if convert is not None:
            val = convert(val)
        _BROADCAST_CACHE[key] = val
    return val


class _WebTable:
    """Zero-copy keyed view of the broadcast web fixture table.

    Lookup is vectorized: ``pc.index_in(batch_urls, web_urls)`` + ``take`` —
    no per-worker python index build (which would serialize scaling: every
    added worker would pay the full build before doing useful work).  The
    plasma-backed Arrow buffers are shared across workers on a node.
    """

    def __init__(self, tbl: pa.Table):
        # combine_chunks copies the whole table — callers must broadcast a
        # single-chunk table (combine ONCE on the driver before ray.put;
        # 32 workers each copying a multi-GB table saturates memory
        # bandwidth and kills scaling)
        if tbl.column("url").num_chunks != 1:
            tbl = tbl.combine_chunks()
        self.tbl = tbl
        self.lm_ms = pc.divide(
            pc.subtract(tbl["last_modified"].cast(pa.int64()), FIXTURE_EPOCH_US), 1000
        )
        # one-time url -> row-position index per worker process.  This is a
        # key-only dict (NOT a full-row materialization) — ~60 B/URL — and
        # beats pc.index_in, which would rebuild its value-set hash table on
        # EVERY batch call (O(|web|) per batch ⇒ quadratic over a pass).
        self.pos = {u: i for i, u in enumerate(tbl["url"].to_pylist())}

    def lookup(self, batch_urls: list[str]):
        """Returns (valid mask, hit-position map, matched columns aligned to
        the hit positions)."""
        import numpy as np

        pos = self.pos
        idx = [pos.get(u, -1) for u in batch_urls]
        valid = np.asarray([i >= 0 for i in idx], dtype=bool)
        hits = pa.array([i for i in idx if i >= 0], pa.int64())
        sub = self.tbl.take(hits)
        cols = {
            "status": sub["status"].to_pylist(),
            "content_type": sub["content_type"].to_pylist(),
            "redirect": sub["redirect"].to_pylist(),
            "content_location": sub["content_location"].to_pylist(),
            "link_headers": sub["link_headers"].to_pylist(),
            "payload": sub["payload"].to_pylist(),
            "last_modified_ms": self.lm_ms.take(hits).to_pylist(),
        }
        hit_pos = np.cumsum(valid) - 1  # position into `cols` for each hit
        return valid, hit_pos, cols


def _as_web_index(obj):
    """Accept a prebuilt dict (oracle/unit-test path) or a (zero-copy
    plasma) Arrow table (pipeline path)."""
    return obj if isinstance(obj, dict) else _WebTable(obj)


def make_fetch_fn(web_ref, robots_ref, cfg: CrawlConfig):
    """Stateless-task variant of :class:`Fetcher` with per-process state
    caching — used by the round loop where per-execution actor startup would
    dominate small rounds."""

    def fetch(batch: pa.Table) -> pa.Table:
        web = _cached_get(web_ref, convert=_as_web_index)
        robots = _cached_get(robots_ref)
        return fetch_batch(batch, web, robots, cfg)

    return fetch


def fetch_batch(
    batch: pa.Table, web: dict[str, dict], robots: dict[str, list], cfg: CrawlConfig
) -> pa.Table:
    """Batch kernel: one ``process_fetch`` per scheduled row; Arrow in/out."""
    n = batch.num_rows
    urls = batch["url"].to_pylist()
    hosts = batch["host"].to_pylist()
    prev_upd = (
        batch["updated_ms"].to_pylist() if "updated_ms" in batch.column_names else [None] * n
    )
    prev_states = (
        batch["state"].to_pylist() if "state" in batch.column_names else ["NEW"] * n
    )

    status = np.zeros(n, dtype=np.int32)
    ctype = [""] * n
    redirect = [""] * n
    content_location = [""] * n
    payloads: list[bytes | None] = [None] * n
    spans: list[list | None] = [None] * n
    out_links: list[list[str]] = [[] for _ in range(n)]
    states = [""] * n
    fresh = np.ones(n, dtype=bool)
    unchanged = np.zeros(n, dtype=bool)

    if isinstance(web, _WebTable):
        valid, hit_pos, cols = web.lookup(urls)
        keys = (
            "status",
            "content_type",
            "redirect",
            "content_location",
            "link_headers",
            "payload",
            "last_modified_ms",
        )

        def get_webrow(i: int):
            if not valid[i]:
                return None
            j = int(hit_pos[i])
            return {k: cols[k][j] for k in keys}

    else:

        def get_webrow(i: int):
            return web.get(urls[i])

    for i in range(n):
        # previously-fetched rows carry updated_ms for If-Modified-Since
        prev = prev_upd[i] if prev_states[i] not in ("NEW", "FORCE") else None
        rec = process_fetch(urls[i], get_webrow(i), robots.get(hosts[i]), cfg, prev)
        status[i] = rec["status"]
        ctype[i] = rec["content_type"]
        redirect[i] = rec["redirect"]
        content_location[i] = rec["content_location"]
        payloads[i] = rec["payload"] if rec["fresh"] else None
        spans[i] = rec["spans"]
        out_links[i] = rec["out_links"]
        # A2 unchanged path leaves the persisted state untouched
        # (db_unchanged_uristr updates only time/error columns)
        states[i] = prev_states[i] if rec["unchanged"] else state_name(rec["state"])
        fresh[i] = rec["fresh"]
        unchanged[i] = rec["unchanged"]

    cols = {name: batch[name] for name in batch.column_names}
    cols.update(
        {
            "status": pa.array(status, pa.int32()),
            "content_type": pa.array(ctype, pa.string()),
            "redirect": pa.array(redirect, pa.string()),
            "content_location": pa.array(content_location, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "spans": pa.array(
                [s if s is not None else [] for s in spans], pa.list_(SPAN_TYPE)
            ),
            "has_doc": pa.array([s is not None for s in spans], pa.bool_()),
            "out_links": pa.array(out_links, pa.list_(pa.string())),
            "state": pa.array(states, pa.string()),
            "fresh": pa.array(fresh, pa.bool_()),
            "unchanged": pa.array(unchanged, pa.bool_()),
        }
    )
    return pa.table(cols)
