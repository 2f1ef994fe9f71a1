"""Core data model: crawl states, Arrow schemas, configuration.

Ray-Data-native re-expression of the reference's data model
(bbcarchdev/anansi).  The reference keeps all long-lived state in two SQL
tables plus a blob cache (see /root/reference/libspider/queues/db.c:340-427
for ``crawl_resource`` and db.c:279-338 for ``crawl_root``); here every
mutable SQL row becomes either an immutable column in a round's ledger
Dataset or explicit actor state checkpointed per round.

Nothing in this module touches Ray — it is pure schema/enum/config code so
it can be unit-tested without a cluster.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field, fields

import pyarrow as pa


class CrawlState(enum.IntEnum):
    """Mirror of the reference CRAWLSTATE enum.

    Reference: /root/reference/libcrawl/libcrawl.h:31-53 (COS_ERR=-1,
    COS_NEW=0, COS_FAILED, COS_REJECTED, COS_ACCEPTED, COS_COMPLETE,
    COS_FORCE, COS_SKIPPED, COS_SKIPPED_COMMIT).  ``COMPLETE`` is only set
    by downstream consumers (the MQ ack path, /root/reference/mq/mq.c:441-468).
    """

    ERR = -1
    NEW = 0
    FAILED = 1
    REJECTED = 2
    ACCEPTED = 3
    COMPLETE = 4
    FORCE = 5
    SKIPPED = 6
    SKIPPED_COMMIT = 7  # in-memory only: committed to cache but not processed


#: states that appear in the persisted ledger (SKIPPED_COMMIT collapses to
#: SKIPPED on persist, mirroring db.c's ENUM which has no SKIPPED_COMMIT).
LEDGER_STATES = (
    "NEW",
    "FAILED",
    "REJECTED",
    "ACCEPTED",
    "COMPLETE",
    "FORCE",
    "SKIPPED",
)


def state_name(s: int) -> str:
    n = CrawlState(s).name
    return "SKIPPED" if n == "SKIPPED_COMMIT" else n


# ---------------------------------------------------------------------------
# Arrow schemas
# ---------------------------------------------------------------------------

#: Frontier / ledger row — the Ray-Data equivalent of one ``crawl_resource``
#: row (db.c:340-427).  One Dataset snapshot per crawl round.
FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),            # canonical URI (db.c:360)
        pa.field("url_hash", pa.string()),       # 32-hex cache key (db.c:350)
        pa.field("shorthash", pa.uint32()),      # first 8 hex chars (db.c:351)
        pa.field("tinyhash", pa.uint8()),        # shorthash % 256 (db.c:428-453)
        pa.field("host", pa.string()),           # politeness grouping key
        pa.field("root_hash", pa.string()),      # cache key of host root (db.c:355)
        pa.field("depth", pa.int32()),           # BFS generation (engine extension)
        pa.field("priority", pa.float64()),      # link score (engine extension)
        pa.field("state", pa.string()),          # CRAWLSTATE name (db.c:454-487)
        pa.field("status", pa.int32()),          # last HTTP status (db.c:359)
        pa.field("next_fetch_ms", pa.int64()),   # simulated-clock next_fetch (db.c:361)
        pa.field("error_count", pa.int32()),     # 4xx counter (db.c:362)
        pa.field("soft_error_count", pa.int32()),  # 5xx counter (db.c:363)
        pa.field("last_ttl_s", pa.int64()),      # last TTL seconds (db.c:364)
        pa.field("added_round", pa.int32()),
        pa.field("updated_ms", pa.int64()),      # last update, simulated clock
    ]
)

#: Span struct for interleaved text+media documents (BASELINE.json input_hint).
SPAN_TYPE = pa.struct(
    [
        pa.field("kind", pa.string()),       # text | image | audio | link
        pa.field("text", pa.string()),       # non-empty iff kind == text
        pa.field("media_ref", pa.string()),  # non-empty iff kind in {image, audio}
        pa.field("offset", pa.int32()),      # strictly increasing within a row
    ]
)

#: Interleaved-document table: the target payload shape.
DOCUMENT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_TYPE)),
    ]
)

#: Response header map (M5/S4/M8): the JSON sidecar's ``headers`` member
#: (p_libcrawl.h:63-74) — status line under the special key ":", one
#: value-array per as-sent header name, built from the raw header block
#: with the 8 KiB cap (fetch.c:28, 497-552).
HEADERS_TYPE = pa.map_(pa.string(), pa.list_(pa.string()))

#: Fetched-object metadata — the Ray-Data equivalent of the JSON sidecar
#: (/root/reference/libcrawl/p_libcrawl.h:47-75) plus crawl bookkeeping.
FETCHED_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("url_hash", pa.string()),
        pa.field("host", pa.string()),
        pa.field("root_hash", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("seq", pa.int64()),             # global dequeue sequence number
        pa.field("fetch_clock_ms", pa.int64()),  # simulated politeness clock
        pa.field("status", pa.int32()),
        pa.field("content_type", pa.string()),   # normalized media type
        pa.field("redirect", pa.string()),       # canonicalized Location
        pa.field("content_location", pa.string()),  # same-origin checked
        pa.field("link_headers", pa.list_(pa.string())),
        pa.field("headers", HEADERS_TYPE),
        pa.field("payload", pa.binary()),
        pa.field("spans", pa.list_(SPAN_TYPE)),
        pa.field("state", pa.string()),
        pa.field("fresh", pa.bool_()),           # False => 304/rollback path
    ]
)

#: Per-host politeness table — equivalent of ``crawl_root`` (db.c:279-338).
HOST_SCHEMA = pa.schema(
    [
        pa.field("host", pa.string()),
        pa.field("root_hash", pa.string()),
        pa.field("rate_ms", pa.int32()),            # db.c:300, default 1000
        pa.field("earliest_update_ms", pa.int64()),  # politeness gate (db.c:299)
        pa.field("robots_disallow", pa.list_(pa.string())),
        pa.field("partition", pa.string()),          # db.c:564-579
    ]
)


# ---------------------------------------------------------------------------
# Configuration
# ---------------------------------------------------------------------------


@dataclass
class CrawlConfig:
    """Engine configuration — the Ray equivalent of crawl.conf INI sections
    (/root/reference/crawler/crawl.conf:1-112).
    """

    # [crawler] — parallelism; maps thread count -> actor-pool size
    fetch_concurrency: int = 4
    fetch_batch_size: int = 1024
    #: fetch stage flavor: False (default) = stateless tasks with a
    #: per-worker-process broadcast cache (amortizes across rounds without
    #: per-execution actor startup); True = Fetcher actor pool of size
    #: ``fetch_concurrency`` (≙ crawler:threads, crawl.conf:14-15)
    fetch_actor_pool: bool = False
    # politeness (db.c:300: default root rate = 1000 ms)
    default_rate_ms: int = 1000
    #: engine-extension dequeue order (north_star: "priority queue keyed by
    #: crawl depth + RDF link score"): when True, within each host NEW rows
    #: order by (link-score desc, depth asc) before the O1 tail; the ledger
    #: carries the in-degree score in the ``priority`` column.  False (the
    #: default) reproduces the reference's O1 order exactly (db.c:691).
    use_priority: bool = False
    #: per-host fetch budget per round (O2 top-k); None = unlimited (each
    #: round drains every eligible row — BFS-wave rounds).  A finite budget
    #: bounds per-round memory per host but multiplies round count for hub
    #: hosts (a 10^6-URL hub at budget 8 = 125k rounds), so the default is
    #: unlimited and skew is handled by slot *timestamps*, not row caps.
    per_host_budget: int | None = None
    #: ordered policy-name chain resolved via anansi_ray.registry
    #: (≙ spider_add_policy calls, context.c:822-851; ≤8 per p_libspider.h:41)
    policies: tuple[str, ...] = ("schemes", "robots", "content-types")
    #: processor name (processor.c:40-67); "" = auto: "lod" when the
    #: license filter is enabled, else "rdf"
    processor_name: str = ""
    # [policy:schemes] whitelist/blacklist (schemes.c:133-170)
    scheme_whitelist: tuple[str, ...] = ("http", "https")
    scheme_blacklist: tuple[str, ...] = ()
    # [policy:content-types] (content-types.c:155-226); empty whitelist = allow all
    content_type_whitelist: tuple[str, ...] = ()
    content_type_blacklist: tuple[str, ...] = ()
    #: F8 mirror-prefix policy (crawl-mirror.c:119-139): when non-empty,
    #: only URLs string-prefixed by one of these proceed (add
    #: "mirror-prefix" to `policies` to activate the hook)
    mirror_prefixes: tuple[str, ...] = ()
    # [lod:licenses] whitelist/blacklist (crawl.conf:78-84, lod.c:139-198)
    license_whitelist: tuple[str, ...] = ()
    license_blacklist: tuple[str, ...] = ()
    license_filter_enabled: bool = False
    # TTL floors (db.c:962-976): status==200 => >=3600s else >=86400s
    ttl_ok_s: int = 3600
    ttl_other_s: int = 86400
    ttl_unchanged_s: int = 7200          # db.c:1101-1111: else-branch now+2h
    ttl_unchanged_error_s: int = 604800  # db.c:1101-1111: error => now+7d
    ttl_accepted_s: int = 86400          # processor.c:213-222
    ttl_not_accepted_s: int = 604800     # processor.c:213-222
    #: TTL passed by the failed-callback path (uri-policy reject, checkpoint
    #: reject with nothing cached) — processor.c:261 hardcodes 86400
    ttl_failed_s: int = 86400
    #: root gate bump after any update: earliest_update = now + 2 s (db.c:1005ff)
    root_gate_bump_ms: int = 2000
    # limits
    max_depth: int = 64
    max_rounds: int = 1000
    #: incremental re-crawl horizon (simulated ms): when set, rows whose
    #: next_fetch falls on or before the horizon are re-fetched after their
    #: TTL elapses (the reference's unbounded incremental loop, bounded for
    #: batch execution); None = single-pass crawl.
    refetch_horizon_ms: int | None = None
    #: dedup / seen-set shards (ST1); shard = shorthash % n
    seen_shards: int = 8
    #: per-host politeness state backend (≙ crawl_root): "driver" dict
    #: (default, right to ~10^7 hosts) or "sharded" actor pool for 10^8+
    host_state_backend: str = "driver"
    host_state_shards: int = 8
    #: seen-set backend: "exact" (conformance-grade) or "cuckoo" (compact
    #: approximate filter, ~2-4 B/URL; rare false positives drop new URLs)
    seen_backend: str = "exact"
    # checkpointing
    checkpoint_dir: str = "/tmp/anansi_ray_ckpt"
    # robots.txt handling (engine extension; reference policy hook F3/F4)
    respect_robots: bool = True
    extra: dict = field(default_factory=dict)


def _split_list(v: str) -> tuple[str, ...]:
    return tuple(x.strip().strip('"') for x in v.replace(",", " ").split() if x.strip())


def _config_from_ini(path: str) -> "CrawlConfig":
    """crawl.conf-shaped INI → CrawlConfig (section/key mapping mirrors
    /root/reference/crawler/crawl.conf:1-112; keys without an engine
    equivalent — [cluster], [log], [queue] database URIs — land in
    ``extra`` or are ignored with the rationale documented in SURVEY §2.11:
    clustering is Ray's job, the ledger/spool IS the queue)."""
    import configparser

    cp = configparser.ConfigParser(strict=False, inline_comment_prefixes=(";", "#"))
    cp.read(path)
    cfg = CrawlConfig()

    def g(section: str, key: str) -> str | None:
        try:
            return cp.get(section, key).strip().strip('"')
        except (configparser.NoSectionError, configparser.NoOptionError):
            return None

    v = g("crawler", "threads")
    if v:
        cfg.fetch_concurrency = int(v)
    v = g("processor", "name")
    if v:
        cfg.processor_name = v
        if v == "lod":
            cfg.license_filter_enabled = True
    for sec, wl_field, bl_field in (
        ("policy:schemes", "scheme_whitelist", "scheme_blacklist"),
        ("policy:content-types", "content_type_whitelist", "content_type_blacklist"),
        ("lod:licenses", "license_whitelist", "license_blacklist"),
    ):
        v = g(sec, "whitelist")
        if v:
            setattr(cfg, wl_field, _split_list(v))
        v = g(sec, "blacklist")
        if v:
            setattr(cfg, bl_field, _split_list(v))
    v = g("cache", "uri")
    if v:
        cfg.extra["cache_uri"] = v
    v = g("queue", "uri")
    if v:
        cfg.extra["queue_uri"] = v  # informational: the ledger/spool is the queue
    return cfg


def config_from_file(path: str) -> "CrawlConfig":
    """Load engine configuration from a file: ``.ini``/``.conf`` uses the
    reference's crawl.conf section layout; ``.json`` maps keys directly onto
    CrawlConfig fields (unknown keys go to ``extra``)."""
    if path.endswith((".ini", ".conf")):
        return _config_from_ini(path)
    import json

    with open(path) as f:
        data = json.load(f)
    cfg = CrawlConfig()
    names = {f.name for f in fields(CrawlConfig)}
    for k, v in data.items():
        if k in names:
            if isinstance(getattr(cfg, k), tuple) and isinstance(v, list):
                v = tuple(v)
            setattr(cfg, k, v)
        else:
            cfg.extra[k] = v
    return cfg


DEFAULT_CONFIG = CrawlConfig()


#: Media-type -> parser name table (rdf.c:208-239).
RDF_PARSER_BY_TYPE = {
    "text/turtle": "turtle",
    "application/x-turtle": "turtle",
    "application/turtle": "turtle",
    "application/rdf+xml": "rdfxml",
    "text/n3": "turtle",
    "text/plain": "ntriples",
    "application/n-triples": "ntriples",
    "text/x-nquads": "nquads",
    "application/n-quads": "nquads",
}
