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
from anansi_ray.model import CrawlConfig, CrawlState, HEADERS_TYPE, SPAN_TYPE, state_name
from anansi_ray.registry import (
    apply_checkpoint_policies,
    apply_uri_policies,
    get_processor,
)
from anansi_ray.stages.parse import parser_for


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


#: states the failed callback accepts; anything else coerces to FAILED
#: (processor.c:247-261)
_FAILED_STATES = (CrawlState.FAILED, CrawlState.REJECTED, CrawlState.SKIPPED)

#: raw header-block byte cap (fetch.c:28 MAX_HEADERS_SIZE); libcurl aborts
#: the transfer when the accumulated block would exceed it (the header
#: callback returns 0, fetch.c:270-273), which surfaces as a transport error
MAX_HEADERS_SIZE = 8192


def parse_header_block(raw: str | bytes | None, cap: int = MAX_HEADERS_SIZE):
    """M5 — raw response header text → ordered (name, [values]) pairs.

    Mirrors ``crawl_generate_info_`` (fetch.c:497-552): the first line is
    stored under the special key ``":"``; lines without a colon are
    skipped; exactly ONE whitespace character after the colon is trimmed
    (fetch.c:532-535); names keep their as-sent case and repeat headers
    append to the same key's value array.

    Returns ``None`` when the block exceeds ``cap`` bytes — the reference
    aborts such transfers (fetch.c:270-273), i.e. transport-error
    semantics, not truncation.
    """
    if raw is None:
        return None
    data = raw.decode("utf-8", "replace") if isinstance(raw, (bytes, bytearray)) else raw
    if len(data.encode("utf-8", "surrogateescape")) > cap:
        return None
    pairs: list[tuple[str, list[str]]] = []
    index: dict[str, list[str]] = {}
    first = True
    for line in data.split("\n"):
        line = line.rstrip("\r")
        if not line:
            first = False  # blank line: below it would be a next block/body
            continue
        if first:
            pairs.append((":", [line]))
            index[":"] = pairs[-1][1]
            first = False
            continue
        name, sep, value = line.partition(":")
        if not sep:
            continue
        if value[:1] in (" ", "\t"):
            value = value[1:]
        vals = index.get(name)
        if vals is None:
            vals = []
            pairs.append((name, vals))
            index[name] = vals
        vals.append(value)
    return pairs


def _header_get(pairs, name: str) -> list[str]:
    """Case-insensitive multi-value lookup (fetch.c:536-543 strcasecmp)."""
    low = name.lower()
    out: list[str] = []
    for k, vals in pairs:
        if k.lower() == low:
            out.extend(vals)
    return out


def _status_from_line(pairs) -> int | None:
    """HTTP status from the ``":"`` status line (``HTTP/1.1 200 OK``)."""
    for k, vals in pairs:
        if k == ":" and vals:
            parts = vals[0].split()
            if len(parts) >= 2 and parts[1][:3].isdigit():
                return int(parts[1][:3])
    return None


def process_fetch(
    url: str,
    webrow: dict | None,
    robots_disallow,
    cfg: CrawlConfig,
    prev_updated_ms: int | None = None,
) -> dict:
    """Simulate one fetch+process cycle; returns the fetched-record dict.

    ``webrow`` is the matching ``web`` fixture row (None = network miss ⇒
    synthesized 504, fetch.c:145-151).  ``prev_updated_ms`` is the previous
    successful fetch clock — non-None means a cached copy exists, driving
    the If-Modified-Since / rollback protocol (fetch.c:71-95, 155-171).

    The result routes through the reference's three queue paths exactly:

    * **failed callback** (processor.c:247-261): pre-fetch policy reject, or
      checkpoint reject / rollback with nothing cached — ``ttl_base_s`` =
      86400, state coerced into {FAILED, REJECTED, SKIPPED}.
    * **unchanged callback** (fetch.c:239-246 → processor.c:226-240, always
      error=0): 304, or ≥500 / checkpoint-reject with a cached copy —
      ``unchanged=True``, ledger state/status untouched by the caller.
    * **updated callback** (processor.c:156-224): everything committed
      fresh — 301-303 enqueue their redirect and become SKIPPED; other
      non-2xx / unknown media types are SKIPPED by the rdf_preprocess gates
      (rdf.c:161-241); parsed docs pass the LOD license filter to become
      ACCEPTED (ttl 86400) or REJECTED (ttl 604800).
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
        "ttl_base_s": cfg.ttl_not_accepted_s,
        "headers": None,  # ordered (name, [values]) pairs, ":" = status line
    }
    cached = prev_updated_ms is not None

    # pre-fetch URI policy chain (F1/F3/F4 — name-resolved via the
    # registry, first non-None verdict wins) → failed callback
    st = apply_uri_policies(url, cfg, {"robots_disallow": robots_disallow})
    if st is not None:
        rec["state"] = st if st in _FAILED_STATES else CrawlState.FAILED
        rec["ttl_base_s"] = cfg.ttl_failed_s
        return rec

    # derive the wire view: raw header block when the fixture carries one
    # (M5/S4/M8 — parsed with the 8 KiB cap), else the structured columns
    loc_raw = cl_raw = None
    link_values: list[str] | None = None
    payload = None
    if webrow is None:
        # transport error: no headers arrive, status synthesized (fetch.c:148)
        status = 504
        rec["content_type"] = ""
    else:
        headers = parse_header_block(webrow.get("raw_headers"))
        if webrow.get("raw_headers") is not None and headers is None:
            # oversized header block aborts the transfer (fetch.c:270-273)
            status = 504
            rec["content_type"] = ""
            webrow = None
        else:
            if headers is not None:
                rec["headers"] = headers
                status = _status_from_line(headers)
                if status is None:
                    status = int(webrow["status"])
                ct = _header_get(headers, "Content-Type")
                rec["content_type"] = ct[0] if ct else ""
                locs = _header_get(headers, "Location")
                loc_raw = locs[0] if locs else None
                cls = _header_get(headers, "Content-Location")
                cl_raw = cls[0] if cls else None
                link_values = _header_get(headers, "Link")
            else:
                status = int(webrow["status"])
                rec["content_type"] = webrow.get("content_type") or ""
                loc_raw = webrow.get("redirect")
                cl_raw = webrow.get("content_location")
                link_values = webrow.get("link_headers")
            payload = webrow.get("payload")
            # If-Modified-Since → server 304 (fetch.c:89-95 request header,
            # fetch.c:155-159 rollback on response)
            lm = webrow.get("last_modified_ms")
            if cached and lm is not None and status == 200 and lm <= prev_updated_ms:
                status = 304
    rec["status"] = status

    # C4 rollback protocol: 304, or ≥500 with a cached copy, rolls back to
    # the cache → unchanged callback (fetch.c:155-171, 239-246)
    if status == 304 or (status >= 500 and cached):
        if not cached:  # rollback with nothing cached (fetch.c:219-225)
            rec["state"] = CrawlState.FAILED
            rec["ttl_base_s"] = cfg.ttl_failed_s
            return rec
        rec["fresh"] = False
        rec["unchanged"] = True
        rec["state"] = CrawlState.SKIPPED  # caller persists the PREVIOUS state
        return rec

    # checkpoint policy chain: content-type etc.; 3xx ⇒ SKIPPED_COMMIT (F2)
    st, status = apply_checkpoint_policies(status, rec["content_type"], cfg)
    rec["status"] = status
    if st is not None and st != CrawlState.SKIPPED_COMMIT:
        if cached:
            # checkpoint reject rolls back; a cached copy makes it the
            # unchanged path (fetch.c:361-366 sets rollback, fetch.c:239-246)
            rec["fresh"] = False
            rec["unchanged"] = True
            rec["state"] = CrawlState.SKIPPED
            return rec
        rec["state"] = st if st in _FAILED_STATES else CrawlState.FAILED
        rec["ttl_base_s"] = cfg.ttl_failed_s
        return rec

    # committed fresh: the payload is cached whatever the status
    rec["payload"] = payload

    # updated callback: 301-303 enqueue the redirect target when it differs
    # from the source URI (processor.c:177-192), then SKIPPED
    if 300 < status < 304:
        loc = loc_raw
        if loc:
            c = canonicalize(loc, base=url)
            if c and c != url:
                rec["redirect"] = c
        rec["state"] = CrawlState.SKIPPED_COMMIT  # persists as SKIPPED
        return rec

    # rdf_preprocess gates (F6, rdf.c:161-241): non-2xx and unknown media
    # types are SKIPPED (ttl 604800), never FAILED
    if status < 200 or status > 299:
        rec["state"] = CrawlState.SKIPPED
        return rec

    # same-origin-checked Content-Location (M6/M7, fetch.c:418-449)
    cl = cl_raw
    if cl:
        c = canonicalize(cl, base=url)
        if c and is_same_origin(c, url):
            rec["content_location"] = c

    # media-type acceptance gate: RDF processors gate on the parser table
    # (rdf_preprocess, rdf.c:208-239); a processor may override via an
    # ``accepts(content_type)`` attribute (e.g. the html processor)
    proc = get_processor(cfg)
    accepts = getattr(proc, "accepts", None)
    known_type = (
        accepts(rec["content_type"])
        if accepts is not None
        else parser_for(rec["content_type"]) is not None
    )
    if not known_type:
        rec["state"] = CrawlState.SKIPPED
        return rec

    # name-resolved processor ("rdf" / "lod" / "html" / user-registered,
    # processor.c:40-67): parse failure ⇒ FAILED; the lod license filter
    # verdict lands before link collection (rdf.c:311-320)
    pstate, out_links, spans = proc(
        rec["payload"],
        url,
        rec["content_type"],
        link_values,
        rec["content_location"] or None,
        cfg,
    )
    if pstate not in (
        CrawlState.ACCEPTED,
        CrawlState.REJECTED,
        CrawlState.SKIPPED,
        CrawlState.FAILED,
    ):
        pstate = CrawlState.FAILED  # COS_NEW/ERR coercion (processor.c:204-211)
    rec["state"] = pstate
    rec["out_links"] = out_links
    rec["spans"] = spans
    if pstate == CrawlState.ACCEPTED:
        rec["accepted"] = True
        rec["ttl_base_s"] = cfg.ttl_accepted_s
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
    raw_headers = cols.get("raw_headers", [None] * tbl.num_rows)
    out = {}
    for i, url in enumerate(cols["url"]):
        out[url] = {
            "status": cols["status"][i],
            "content_type": cols["content_type"][i],
            "redirect": cols["redirect"][i],
            "content_location": cols["content_location"][i],
            "link_headers": cols["link_headers"][i],
            "payload": cols["payload"][i],
            "raw_headers": raw_headers[i],
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
        # keyed zero-copy view over the plasma-shared Arrow table (same
        # index the cached-task path builds), or a prebuilt dict in tests
        self.web = _as_web_index(web)
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


def prepare_broadcast_table(tbl: pa.Table) -> pa.Table:
    """Make a web table safe + cheap to broadcast: run ONCE on the driver
    before ``ray.put``.

    Variable-width columns near the int32 offset limit (the 4M-URL web's
    payload column is ~4 GB) must move to 64-bit offsets BEFORE any
    combine/take: ``combine_chunks`` silently LEAVES such a column
    multi-chunk (it only merges what fits), and a chunked ``take`` then
    concatenates the source and overflows.  (A still-larger web would need
    large_list for out_links too — the bucketed store is the real path at
    that size.)  Combining to a single chunk here means no worker pays a
    copy: 32 workers each recasting+combining a multi-GB table saturates
    memory (32 × ~5 GB) and kills the broadcast path outright."""
    limit = (1 << 31) - (1 << 27)
    for i, f in enumerate(tbl.schema):
        col = tbl.column(i)
        if col.nbytes < limit:
            continue
        if f.type == pa.binary():
            tbl = tbl.set_column(i, f.name, col.cast(pa.large_binary()))
        elif f.type == pa.string():
            tbl = tbl.set_column(i, f.name, col.cast(pa.large_string()))
    if any(tbl.column(i).num_chunks != 1 for i in range(tbl.num_columns)):
        tbl = tbl.combine_chunks()
    return tbl


class _WebTable:
    """Zero-copy keyed view of the broadcast web fixture table.

    Lookup is vectorized: ``pc.index_in(batch_urls, web_urls)`` + ``take`` —
    no per-worker python index build (which would serialize scaling: every
    added worker would pay the full build before doing useful work).  The
    plasma-backed Arrow buffers are shared across workers on a node.
    """

    def __init__(self, tbl: pa.Table):
        # defensive twin of the driver-side prepare_broadcast_table — a
        # no-op (zero-copy) when the caller broadcast a prepared table
        tbl = prepare_broadcast_table(tbl)
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
            "raw_headers": (
                sub["raw_headers"].to_pylist()
                if "raw_headers" in sub.column_names
                else [None] * sub.num_rows
            ),
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
    prev_status = (
        batch["status"].to_pylist() if "status" in batch.column_names else [0] * n
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
    ttl_base = np.zeros(n, dtype=np.int64)
    ledger_status = np.zeros(n, dtype=np.int32)
    headers_col: list = [None] * n

    if isinstance(web, _WebTable):
        valid, hit_pos, cols = web.lookup(urls)
        keys = (
            "status",
            "content_type",
            "redirect",
            "content_location",
            "link_headers",
            "payload",
            "raw_headers",
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
        # A2 unchanged path leaves the persisted state AND status untouched
        # (db_unchanged_uristr updates only time/error columns)
        states[i] = prev_states[i] if rec["unchanged"] else state_name(rec["state"])
        ledger_status[i] = prev_status[i] if rec["unchanged"] else rec["status"]
        fresh[i] = rec["fresh"]
        unchanged[i] = rec["unchanged"]
        ttl_base[i] = rec["ttl_base_s"]
        headers_col[i] = rec["headers"]

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
            "ttl_base_s": pa.array(ttl_base, pa.int64()),
            "ledger_status": pa.array(ledger_status, pa.int32()),
            "headers": pa.array(headers_col, HEADERS_TYPE),
        }
    )
    return pa.table(cols)
