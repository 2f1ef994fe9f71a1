"""The Ray-Data crawl round pipeline (C1-C3, J1-J4, O1-O2, D1-D4, A1-A2).

One crawl round r (SURVEY.md §3.4):

    due_r      = frontier_r.map_batches(due filter)      # state NEW/FORCE,
                                                         # host politeness-ready
    sched_r    = due_r.groupby(host).map_groups(top-k by O1 key, chained
                 politeness slots)              (≙ db_next_txn, db.c:611-791)
    spool_r    = sched_r → fetch → transition → spool projection
                 → write_parquet(round=r)       # the round's ONE execution:
                 # ledger snapshot + docs/cache columns (≙ cache commit) +
                 # canonicalized, batch-pre-deduped candidate links (cand)
    cand_r     = read(spool_r, columns=[cand]) → flatten
                 → min-depth/score merge                 # round dedup
                 → SeenRouter / seen set                # global anti-join (ST1)
    frontier_r+1 = (frontier_r − fetched) ∪ new_rows    # immutable merge

Design decisions for a 10^10-URL frontier on a multi-node cluster (verified
single-node):

* the frontier holds ONLY undecided rows (state NEW/FORCE, plus
  horizon-cycled TTL rows): transitioned rows stream OUT each round to the
  partitioned parquet spool (``spool_dir/round=N`` with a lineage
  manifest) and are never rescanned — the reference equivalently touches
  fetched rows only via indexed point updates (db.c:944-1059).  The
  driver accumulates nothing but per-host counters, a size-capped removal
  set and per-round metric dicts; ``results()``/``ledger_table()`` re-read
  the spool (driver-RSS flatness measured in tools/measure_driver_rss.py).
* dual-plane control: below the memory-derived ``driver_plane_threshold``
  the frontier is a driver-resident Arrow table — due-filter, O1/priority
  scheduling and the candidate merge are vectorized driver ops costing
  ZERO Ray executions to plan a round (Ray's per-execution latency
  dominates small/medium waves).  Crossing the threshold converts it
  (monotonically) to a Dataset: the segmented-scan scheduler and groupby
  merges take over — the 10^10 shape, where per-round fixed costs
  amortize over 10^8-row waves.  Both planes implement identical rules;
  conformance tests run both.
* per-host politeness + eligibility counters (≙ crawl_root) live behind
  the state/hoststate.py facade: a driver dict by default, or sharded
  actors (cfg.host_state_backend="sharded") with batch RPCs per round for
  10^8+-host universes — the driver then holds only each round's due-host
  view, bounded by actual work.
* per-round driver traffic is fetch *metadata* (url_hash/host/clock/state
  — ``_meta_project``); payloads and spans go straight to partitioned
  parquet sinks and never shuffle (SURVEY §7.4).
* the only all-to-all exchanges are the distributed plane's sort/groupby
  of the DUE subset, the hash-partition groupby of batch-pre-deduped
  candidate links (one vectorized merge kernel per partition, not
  per-hash map_groups), and (bucketed-store mode) the hash exchange of
  scheduled metadata on the cache-bucket key — all the reference's own
  partitioning keys (db.c:687, db.c:1210, db.c:1235-1250).
* hub-host skew: politeness slots are computed (not slept), so the fetch
  pool runs decoupled from host grouping, and the segmented-scan
  scheduler bounds per-task memory to one batch regardless of a hub's due
  set size.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from anansi_ray.arrowds import drop_empty_blocks as _drop_empty_blocks
from anansi_ray.arrowds import from_arrow_local as _from_arrow_local
from anansi_ray.canon import canon_batch, canonicalize, cache_key, root_of
from anansi_ray.model import CrawlConfig
from anansi_ray.stages.fetch import make_fetch_fn, prepare_broadcast_table
from anansi_ray.stages.transitions import transition_batch
from anansi_ray.state.hoststate import make_host_state
from anansi_ray.state.seen import SeenRouter, SeenSet, make_seen_filter

LEDGER_COLS = [
    "url",
    "url_hash",
    "host",
    "root_hash",
    "depth",
    "priority",
    "state",
    "status",
    "next_fetch_ms",
    "error_count",
    "soft_error_count",
    "last_ttl_s",
    "added_round",
    "updated_ms",
]

LEDGER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.string()),
        ("host", pa.string()),
        ("root_hash", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.float64()),
        ("state", pa.string()),
        ("status", pa.int32()),
        ("next_fetch_ms", pa.int64()),
        ("error_count", pa.int32()),
        ("soft_error_count", pa.int32()),
        ("last_ttl_s", pa.int64()),
        ("added_round", pa.int32()),
        ("updated_ms", pa.int64()),
    ]
)


def _rss_probe(tag: str) -> None:
    """Env-gated (ANANSI_RSS_DEBUG=1) per-phase driver-memory probe used to
    attribute round-level RSS growth to a pipeline phase."""
    if not os.environ.get("ANANSI_RSS_DEBUG"):
        return
    anon = shmem = -1
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("RssAnon:"):
                anon = int(line.split()[1]) // 1024
            elif line.startswith("RssShmem:"):
                shmem = int(line.split()[1]) // 1024
    print(f"    [rss {tag}] anon={anon} MiB shmem={shmem} MiB", flush=True)


def _ds_to_table(ds: rd.Dataset) -> pa.Table | None:
    # materialize first: to_arrow_refs() on a lazy plan re-executes it a
    # second time (limit-1) just to fetch the schema.
    tables = [
        t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows > 0
    ]
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="default")


def _empty_ledger_table() -> pa.Table:
    return LEDGER_SCHEMA.empty_table()


def _make_due_filter(due_hosts_ref, fetched_shards, refetch: bool = False):
    """map_batches fn: keep frontier rows that are due this round — state
    NEW/FORCE (plus, in refetch mode, any TTL-due row the merge cycled back
    into the frontier), host in the politeness-ready set, not already
    fetched (lazy removal) — ≙ the dequeue WHERE clause (db.c:681-692).

    Fully vectorized: state and due-host masks are ``pc`` kernels against
    the broadcast host array; the already-fetched anti-join probes the
    FETCHED-set shard actors (one ``contains`` RPC per shard per batch) —
    nothing row-wise in Python and no per-round re-broadcast of a
    driver-side removed set.  Stateless task (not an actor pool): the
    broadcast refs resolve from the local object store per task and the
    mutable state lives in the shards."""
    from anansi_ray.state.seen import ContainsRouter

    router = ContainsRouter(fetched_shards) if fetched_shards else None

    def due_filter(batch: pa.Table) -> pa.Table:
        if not refetch:
            states = batch["state"]
            mask = pc.or_(pc.equal(states, "NEW"), pc.equal(states, "FORCE"))
            batch = batch.filter(mask)
        if batch.num_rows == 0:
            return batch
        due_arr = ray.get(due_hosts_ref)  # pa.Array of due host names
        batch = batch.filter(pc.is_in(batch["host"], value_set=due_arr))
        if router is not None and batch.num_rows:
            fetched = router.contains_mask(batch["url_hash"].to_pylist())
            if fetched.any():
                batch = batch.filter(pa.array(~fetched))
        return batch

    return due_filter


#: the reference's O1 dequeue order (db.c:691) with the pinned tie-break
ORDER_REFERENCE = [
    ("_old", "ascending"),
    ("next_fetch_ms", "ascending"),
    ("url_hash", "ascending"),
]
#: engine-extension priority order (BASELINE.json north_star: "priority
#: queue keyed by crawl depth + RDF link score"): NEW rows first, higher
#: in-degree link score first, shallower depth first, then the O1 tail
ORDER_PRIORITY = [
    ("_old", "ascending"),
    ("priority", "descending"),
    ("depth", "ascending"),
    ("next_fetch_ms", "ascending"),
    ("url_hash", "ascending"),
]


def order_keys(cfg: CrawlConfig) -> list[tuple[str, str]]:
    return ORDER_PRIORITY if cfg.use_priority else ORDER_REFERENCE


def _make_scheduler(budget: int | None, eu_rate_ref, keys=None):
    """groupby(host).map_groups body: O1 ordering + causally-chained
    politeness slots ``t_j = max(t_{j-1} + rate, next_fetch_j)`` (≙ the
    dequeue txn's ORDER BY + earliest_update write + next_fetch time gate,
    db.c:689-691, 762-790). Tie-break pinned on url_hash (SURVEY §7.4)."""
    keys = keys or ORDER_REFERENCE

    def schedule(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.append_column("fetch_clock_ms", pa.array([], pa.int64()))
        host = group["host"][0].as_py()
        eu, rate = ray.get(eu_rate_ref)[host]
        g = group.append_column("_old", pc.not_equal(group["state"], "NEW"))
        order = pc.sort_indices(g, sort_keys=keys)
        if budget:
            order = order[:budget]
        g = g.take(order).drop_columns(["_old"])
        nf = g["next_fetch_ms"].to_numpy(zero_copy_only=False)
        slots = np.empty(len(nf), dtype=np.int64)
        t = int(eu)
        rate = int(rate)
        for j in range(len(nf)):
            t = max(t, int(nf[j]))
            slots[j] = t
            t += rate
        return g.append_column("fetch_clock_ms", pa.array(slots, pa.int64()))

    return schedule


class _Transition:
    """map_batches: A1/A2/A3 ledger-column updates after fetch; drops the
    payload column unless the caller needs the cache sink."""

    def __init__(self, cfg: CrawlConfig, keep_payload: bool):
        self.cfg = cfg
        self.keep_payload = keep_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        tr = transition_batch(
            np.asarray(batch["ttl_base_s"].to_numpy(zero_copy_only=False)),
            np.asarray(batch["status"].to_numpy(zero_copy_only=False)),
            np.asarray(batch["unchanged"].to_numpy(zero_copy_only=False)),
            np.asarray(batch["fetch_clock_ms"].to_numpy(zero_copy_only=False)),
            np.asarray(batch["error_count"].to_numpy(zero_copy_only=False)),
            np.asarray(batch["soft_error_count"].to_numpy(zero_copy_only=False)),
            np.asarray(batch["next_fetch_ms"].to_numpy(zero_copy_only=False)),
            self.cfg,
        )
        for name, arr in tr.items():
            typ = (
                pa.int64()
                if name in ("next_fetch_ms", "last_ttl_s", "updated_ms")
                else pa.int32()
            )
            batch = batch.set_column(
                batch.column_names.index(name), name, pa.array(arr, typ)
            )
        if not self.keep_payload and "payload" in batch.column_names:
            batch = batch.drop_columns(["payload"])
        return batch


def _cand_struct_type() -> pa.StructType:
    return pa.struct(
        [
            ("url", pa.string()),
            ("url_hash", pa.string()),
            ("host", pa.string()),
            ("root_hash", pa.string()),
            ("depth", pa.int32()),
            ("next_fetch_ms", pa.int64()),
            ("score", pa.float64()),
        ]
    )


def _cand_list_column(batch: pa.Table, max_depth: int) -> pa.ListArray:
    """The batch's candidate links as a ``list<struct>`` column: redirect
    (J4) + extracted out-links (M13), canonicalized (M1-M4), invalid and
    beyond-max-depth targets dropped, then PRE-DEDUPED within the batch —
    earliest (next_fetch_ms, depth) occurrence per hash wins, scores count
    one point per referring occurrence (the partial aggregate before the
    cross-batch merge; the min-rule is associative, so partial-then-global
    equals global).  Computed inside the round's single fused output pass,
    so frontier expansion becomes a column-pruned READ of the spool instead
    of its own Dataset execution over ``trans``.

    The deduped candidates attach to the batch's FIRST row (other rows get
    empty lists): ``cand`` is a batch-level aggregate riding a row-aligned
    column, and the flatten side never looks at which row carries it.
    Pre-dedup typically cuts occurrence volume 2-5x on link-heavy rounds
    (hub links repeat on nearly every page), shrinking the spool write and
    the merge read alike.
    """
    n = batch.num_rows
    depth = batch["depth"].to_numpy(zero_copy_only=False)
    clock = batch["fetch_clock_ms"].to_numpy(zero_copy_only=False)
    depth_ok = depth + 1 <= max_depth
    # redirect occurrences (J4): rows with a non-empty redirect, absolute
    # targets (base=None)
    red_col = batch["redirect"]
    ne = pc.not_equal(red_col, "")
    if isinstance(ne, pa.ChunkedArray):
        ne = ne.combine_chunks()
    red_idx = np.flatnonzero(
        ne.to_numpy(zero_copy_only=False) & depth_ok
    ).astype(np.int64)
    # out-link occurrences (M13), flattened via Arrow list offsets — no
    # per-link Python append loop; parent row index via np.repeat
    ol = batch["out_links"]
    if isinstance(ol, pa.ChunkedArray):
        ol = ol.combine_chunks()
    raw_counts = (
        pc.fill_null(pc.list_value_length(ol), 0)
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    link_counts = np.where(depth_ok, raw_counts, 0)
    link_parent = np.repeat(np.arange(n, dtype=np.int64), link_counts)
    # drop over-depth rows' links BEFORE materializing the strings
    flat_all = ol.flatten()
    if not depth_ok.all():
        flat_all = flat_all.filter(pa.array(np.repeat(depth_ok, raw_counts)))
    raw = red_col.take(pa.array(red_idx, pa.int64())).to_pylist() + flat_all.to_pylist()
    bases = [None] * red_idx.size + batch["url"].take(
        pa.array(link_parent, pa.int64())
    ).to_pylist()
    parent_np = np.concatenate([red_idx, link_parent])
    values = pa.array([], type=_cand_struct_type())
    k = 0
    if raw:
        c = canon_batch(raw, bases)
        valid = c["valid"]
        pidx = parent_np[valid]
        if len(pidx):
            d_occ = depth[pidx].astype(np.int32) + 1
            t_occ = clock[pidx].astype(np.int64)
            h_np = c["url_hash"][valid]
            halves = _hex128(pa.array(h_np, pa.string()))
            if halves is not None:
                hi, lo = halves
                order = np.lexsort((d_occ, t_occ, lo, hi))
                hi_s, lo_s = hi[order], lo[order]
                first = np.ones(len(order), dtype=bool)
                first[1:] = (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])
                starts = np.flatnonzero(first)
                counts = np.diff(np.append(starts, len(order))).astype(np.float64)
                win = order[starts]
            else:  # non-canonical hash width — scalar dict fallback
                best: dict[str, int] = {}
                score: dict[str, float] = {}
                for j in range(len(pidx)):
                    h = h_np[j]
                    score[h] = score.get(h, 0.0) + 1.0
                    b = best.get(h)
                    if b is None or (t_occ[j], d_occ[j]) < (t_occ[b], d_occ[b]):
                        best[h] = j
                win = np.fromiter(best.values(), dtype=np.int64, count=len(best))
                counts = np.array([score[h] for h in best], dtype=np.float64)
            k = len(win)
            values = pa.StructArray.from_arrays(
                [
                    pa.array(c["url"][valid][win], pa.string()),
                    pa.array(h_np[win], pa.string()),
                    pa.array(c["host"][valid][win], pa.string()),
                    pa.array(c["root_hash"][valid][win], pa.string()),
                    pa.array(d_occ[win], pa.int32()),
                    pa.array(t_occ[win], pa.int64()),
                    pa.array(counts, pa.float64()),
                ],
                fields=list(_cand_struct_type()),
            )
    offsets = np.full(n + 1, k, dtype=np.int32)
    offsets[0] = 0
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)


def _flatten_cand(tbl: pa.Table) -> pa.Table:
    """Spool ``cand`` lists → candidate rows in the pre-merge schema: a
    pure list flatten (each element already carries depth / clock / the
    batch-partial score from :func:`_cand_list_column`)."""
    cand = tbl["cand"]
    if isinstance(cand, pa.ChunkedArray):
        cand = cand.combine_chunks()
    flat = cand.flatten()
    if len(flat) == 0:
        return _empty_candidates()
    return pa.table(
        {
            "url": flat.field("url"),
            "url_hash": flat.field("url_hash"),
            "host": flat.field("host"),
            "root_hash": flat.field("root_hash"),
            "depth": flat.field("depth"),
            "next_fetch_ms": flat.field("next_fetch_ms"),
            "score": flat.field("score"),
        }
    )


def _empty_candidates() -> pa.Table:
    return pa.schema(
        [
            ("url", pa.string()),
            ("url_hash", pa.string()),
            ("host", pa.string()),
            ("root_hash", pa.string()),
            ("depth", pa.int32()),
            ("next_fetch_ms", pa.int64()),
            ("score", pa.float64()),
        ]
    ).empty_table()


def _schedule_on_driver(
    due_tbl: pa.Table, due_hosts: dict, budget: int | None, keys=None
) -> pa.Table:
    """Driver-plane variant of the groupby(host) scheduler: identical O1
    (or priority) ordering + causal slot chaining, vectorized sort + one
    linear pass."""
    keys = keys or ORDER_REFERENCE
    is_old = pc.not_equal(due_tbl["state"], "NEW")
    g = due_tbl.append_column("_old", is_old)
    order = pc.sort_indices(g, sort_keys=[("host", "ascending")] + keys)
    g = g.take(order).drop_columns(["_old"])
    n = g.num_rows
    # The causal slot chain t_j = max(t_{j-1} + rate, nf_j) rewrites as a
    # per-host-run cummax: with k the rank inside the run,
    # slot_k = cummax_k(max(nf_k - k*rate, t_host)) + k*rate — so one
    # numpy maximum.accumulate per host run replaces the former per-ROW
    # Python loop (the runs are contiguous after the host sort).
    host_arr = g["host"].combine_chunks()
    bounds = np.ones(n, dtype=bool)
    if n > 1:
        bounds[1:] = pc.not_equal(
            host_arr.slice(1), host_arr.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(bounds)
    ends = np.append(starts[1:], n)
    nf = g["next_fetch_ms"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    slots = np.zeros(n, dtype=np.int64)
    keep = np.ones(n, dtype=bool)
    run_hosts = host_arr.take(pa.array(starts, pa.int64())).to_pylist()
    for h, s, e in zip(run_hosts, starts, ends):
        t_host, rate = due_hosts[h]
        if budget and e - s > budget:
            keep[s + budget : e] = False
            e = s + budget
        k = np.arange(e - s, dtype=np.int64)
        x = nf[s:e] - k * rate
        np.maximum(x, int(t_host), out=x)
        np.maximum.accumulate(x, out=x)
        slots[s:e] = x + k * rate
    g = g.append_column("fetch_clock_ms", pa.array(slots, pa.int64()))
    if not keep.all():
        g = g.filter(pa.array(keep))
    return g


#: uint16 little-endian char-pair → byte value, for lowercase-hex parsing
#: (e.g. pair "a3" stored LE as 0x3361 maps to 0xA3); non-hex pairs are 0,
#: unreachable because only canonical md5-hex cache keys take this path
_HEX_PAIR_LUT = np.zeros(65536, dtype=np.uint8)
for _a in b"0123456789abcdef":
    for _b in b"0123456789abcdef":
        _va = _a - 48 - 39 * (_a >= 97)
        _vb = _b - 48 - 39 * (_b >= 97)
        _HEX_PAIR_LUT[_a | (_b << 8)] = (_va << 4) | _vb
del _a, _b, _va, _vb


def _hex128(arr) -> tuple[np.ndarray, np.ndarray] | None:
    """Vectorized parse of an all-32-char-lowercase-hex string column into
    (hi, lo) uint64 halves.  Returns None when any width differs (caller
    falls back to the string sort).  Hex lexicographic order ≡ (hi, lo)
    numeric order, so sorting on the halves reproduces the string sort
    EXACTLY — no truncated-prefix collision to guard.

    Bandwidth-lean: equal widths make the data buffer one contiguous slab,
    viewed (not gathered) as uint16 char pairs; one 64K-entry LUT lookup
    yields the 16 value bytes per hash, re-viewed as two big-endian uint64
    words — no (n, 32) integer temporaries."""
    n = len(arr)
    offs_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(offs_buf, dtype=dt)[arr.offset : arr.offset + n + 1]
    if n == 0 or not (np.diff(offs) == 32).all():
        return None
    data = np.frombuffer(data_buf, dtype=np.uint8)
    flat = data[offs[0] : offs[0] + 32 * n]
    pairs = flat.view(np.uint16).reshape(n, 16)
    by = _HEX_PAIR_LUT[pairs]  # (n, 16) value bytes, most-significant first
    words = np.ascontiguousarray(by).view(">u8").reshape(n, 2)
    return words[:, 0].astype(np.uint64), words[:, 1].astype(np.uint64)


def _merge_candidates_on_driver(cand_tbl: pa.Table) -> pa.Table:
    """Driver-plane variant of the groupby(url_hash) candidate merge:
    earliest (next_fetch_ms, depth) per hash wins; link scores SUM.

    The sort runs on NUMERIC keys — the 128-bit hash parsed into two
    uint64 halves plus next_fetch/depth via one np.lexsort — and only the
    per-hash winners are gathered from the input (occurrence counts run
    5-10x the unique count on link-heavy rounds, so the full-table string
    sort + take this replaces paid most of the merge's cost)."""
    n = cand_tbl.num_rows
    if n == 0:
        return cand_tbl
    hashes = cand_tbl["url_hash"].combine_chunks()
    halves = _hex128(hashes)
    if halves is None:  # non-canonical hash width: exact string-sort path
        order_arr = pc.sort_indices(
            cand_tbl,
            sort_keys=[
                ("url_hash", "ascending"),
                ("next_fetch_ms", "ascending"),
                ("depth", "ascending"),
            ],
        )
        order = order_arr.to_numpy(zero_copy_only=False)
        h_sorted = hashes.take(order_arr)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = pc.not_equal(
                h_sorted.slice(1), h_sorted.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
    else:
        hi, lo = halves
        nf = cand_tbl["next_fetch_ms"].to_numpy(zero_copy_only=False)
        depth = cand_tbl["depth"].to_numpy(zero_copy_only=False)
        order = np.lexsort((depth, nf, lo, hi))
        hi_s, lo_s = hi[order], lo[order]
        first = np.ones(n, dtype=bool)
        first[1:] = (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])
    starts = np.flatnonzero(first)
    # per-run score sum via reduceat: scores are integer-valued in-degree
    # counts (_flatten_cand emits one point per referrer), so the sums are
    # exact under any summation order
    sums = np.add.reduceat(
        cand_tbl["score"].to_numpy(zero_copy_only=False)[order], starts
    )
    t = cand_tbl.take(pa.array(order[starts], pa.int64()))
    return t.set_column(
        t.column_names.index("score"), "score", pa.array(sums, pa.float64())
    )


#: candidate-merge exchange width (distributed plane): hash partitions so
#: the per-PARTITION vectorized kernel replaces per-hash map_groups Python
#: (the dedup family's partition-kernel pattern); per-hash merge within a
#: hash-determined partition ≡ the global per-hash merge
_CAND_PARTS = 64


def _add_cand_part(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return batch.append_column("part", pa.array([], pa.int32()))
    hashes = batch["url_hash"].combine_chunks()
    halves = _hex128(hashes)
    if halves is not None:
        part = (halves[0] % np.uint64(_CAND_PARTS)).astype(np.int32)
    else:  # non-canonical width: scalar fallback on the hash prefix
        part = np.array(
            [int(h[:8], 16) % _CAND_PARTS for h in hashes.to_pylist()],
            dtype=np.int32,
        )
    return batch.append_column("part", pa.array(part, pa.int32()))


def _merge_cand_partition(group: pa.Table) -> pa.Table:
    """Per-partition candidate merge: one vectorized run-boundary pass over
    the whole partition (the same kernel the driver plane runs), replacing
    thousands of per-hash ``map_groups`` invocations."""
    return _merge_candidates_on_driver(group.drop_columns(["part"]))


def _new_ledger_rows(batch: pa.Table, rnd: int) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "url": batch["url"],
            "url_hash": batch["url_hash"],
            "host": batch["host"],
            "root_hash": batch["root_hash"],
            "depth": batch["depth"],
            "priority": batch["score"],
            "state": pa.array(["NEW"] * n, pa.string()),
            "status": pa.array(np.zeros(n, np.int32), pa.int32()),
            "next_fetch_ms": batch["next_fetch_ms"],
            "error_count": pa.array(np.zeros(n, np.int32), pa.int32()),
            "soft_error_count": pa.array(np.zeros(n, np.int32), pa.int32()),
            "last_ttl_s": pa.array(np.zeros(n, np.int64), pa.int64()),
            "added_round": pa.array(np.full(n, rnd, np.int32), pa.int32()),
            "updated_ms": pa.array(np.zeros(n, np.int64), pa.int64()),
        }
    )


def _host_count_pairs(tbl: pa.Table) -> list[tuple[str, int]]:
    """(host, row_count) pairs of a ledger-shaped table (driver-local)."""
    counts = tbl.select(["host"]).group_by("host").aggregate([([], "count_all")])
    return list(
        zip(
            counts["host"].to_pylist(),
            (int(c) for c in counts["count_all"].to_pylist()),
        )
    )


def _host_counts_distributed(ds: rd.Dataset) -> list[tuple[str, int]]:
    """(host, row_count) pairs of a Dataset via per-block partial
    aggregates: each block reduces to its own (host, n) table before the
    driver pull, so driver traffic is O(#hosts per block), never the
    Dataset's row count — the expansion wave itself stays distributed."""

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(["host"]).group_by("host").aggregate([([], "count_all")])
        return agg.rename_columns(["host", "n"])

    from ray.data.aggregate import Sum as _AggSum

    # per-block partials, then a distributed reduce: the pull is O(#hosts)
    # even when the wave spans thousands of blocks
    reduced = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(_AggSum("n", alias_name="n"))
        .materialize()
    )
    parts = [t for t in ray.get(reduced.to_arrow_refs()) if t.num_rows]
    if not parts:
        return []
    merged = pa.concat_tables(parts)
    return list(
        zip(
            merged["host"].to_pylist(),
            (int(c) for c in merged["n"].to_pylist()),
        )
    )


def _due_filter_table(
    frontier: pa.Table, due_hosts: dict, removed: set, refetch: bool
) -> pa.Table:
    """Driver-plane due selection over the driver-resident frontier table —
    the vectorized twin of :func:`_make_due_filter` (same WHERE clause,
    db.c:681-692), with zero Ray executions."""
    if frontier.num_rows == 0:
        return frontier
    mask = None
    if not refetch:
        states = frontier["state"]
        mask = pc.or_(pc.equal(states, "NEW"), pc.equal(states, "FORCE"))
    host_mask = pc.is_in(
        frontier["host"], value_set=pa.array(list(due_hosts), pa.string())
    )
    mask = host_mask if mask is None else pc.and_(mask, host_mask)
    if removed:
        not_removed = pc.invert(
            pc.is_in(
                frontier["url_hash"], value_set=pa.array(list(removed), pa.string())
            )
        )
        mask = pc.and_(mask, not_removed)
    return frontier.filter(mask)


def spool_dir_of(output_dir: str) -> str:
    """The spool location a CrawlPipeline(output_dir=...) run writes to."""
    return os.path.join(output_dir, "spool")


def read_documents(output_dir: str) -> pa.Table:
    """documents VIEW over the fused per-round spool: (doc_id, spans) for
    every ACCEPTED fetch — a column-pruned, predicate-pushed parquet read
    (the round-2 layout wrote this as its own per-round Dataset pass)."""
    import pyarrow.dataset as pads

    ds = pads.dataset(spool_dir_of(output_dir), partitioning="hive")
    t = ds.to_table(columns=["url_hash", "spans"], filter=pads.field("has_doc"))
    return t.rename_columns(["doc_id", "spans"])


def read_cache(output_dir: str) -> pa.Table:
    """cache VIEW over the fused per-round spool (S8 read side): one row
    per fetch with the wire status, headers, content type, freshness flag
    and payload."""
    import pyarrow.dataset as pads

    ds = pads.dataset(spool_dir_of(output_dir), partitioning="hive")
    t = ds.to_table(
        columns=[
            "url_hash",
            "url",
            "wire_status",
            "content_type",
            "headers",
            "fresh",
            "payload",
        ]
    )
    return t.rename_columns(
        ["url_hash", "url", "status", "content_type", "headers", "fresh", "payload"]
    )


def _make_spool_project(
    horizon,
    max_depth: int,
    with_cache: bool = False,
    instance_tag: str = "crawl-0:0",
):
    """Per-round spool row: the persisted ledger snapshot (status =
    ledger_status — db_unchanged leaves the status column untouched,
    db.c:1077-1126) + the wire status for the dequeue-order records + the
    retirement flag + document spans + the driver-bookkeeping has_link
    flag + the canonicalized candidate-link list (``cand``), and — when a
    durable output dir is configured — the cache columns (content type,
    headers, freshness, payload).

    ONE write pass serves every downstream reader (ledger, crawl order,
    documents view, cache view, driver meta, frontier expansion, horizon
    re-admission): parquet column pruning makes each view read only its
    columns, so fusing costs readers nothing while making the spool file
    the round's ONLY materialization — no ``trans.materialize()`` barrier
    and no second/third Dataset execution over the fetched rows."""

    def project(batch: pa.Table) -> pa.Table:
        if horizon is None:
            retired = pa.array(np.ones(batch.num_rows, dtype=bool))
        else:
            retired = pc.greater(batch["next_fetch_ms"], horizon)
        cols = {c: batch[c] for c in LEDGER_COLS}
        cols["status"] = batch["ledger_status"]
        cols["wire_status"] = batch["status"]
        cols["fetch_clock_ms"] = batch["fetch_clock_ms"]
        cols["retired"] = retired
        cols["has_doc"] = pc.equal(batch["state"], "ACCEPTED")
        cols["spans"] = batch["spans"]
        cols["has_link"] = pc.or_(
            pc.greater(pc.list_value_length(batch["out_links"]), 0),
            pc.not_equal(batch["redirect"], ""),
        )
        cols["cand"] = _cand_list_column(batch, max_depth)
        # per-round ownership tag (≙ crawl_instance, db.c:354, 1005):
        # "instance:round" per row — observability only (round immutability
        # already implies single ownership); RLE-compresses to ~nothing
        cols["crawl_instance"] = pa.array(
            np.full(batch.num_rows, instance_tag, dtype=object), pa.string()
        )
        if with_cache:
            for c in ("content_type", "headers", "fresh", "payload"):
                cols[c] = batch[c]
        return pa.table(cols)

    return project


def _make_drop_fetched(fetched_shards):
    """Compaction pass: physically drop rows whose hash the fetched-set
    shards contain (vectorized filter after one contains RPC per shard)."""
    from anansi_ray.state.seen import ContainsRouter

    router = ContainsRouter(fetched_shards)

    def drop_fetched(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        m = router.contains_mask(batch["url_hash"].to_pylist())
        if not m.any():
            return batch
        return batch.filter(pa.array(~m))

    return drop_fetched


def _default_driver_plane_threshold() -> int:
    """Rows the metadata-only scheduling/merge steps may pull to the driver
    before the distributed plane takes over — derived from physical memory
    (~500 B/row of driver-side Arrow + sort scratch, capped at 2% of RAM)
    instead of a hard-coded constant."""
    try:
        mem = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError, AttributeError):
        mem = 8 << 30
    return max(100_000, int(mem * 0.02 / 500))


#: spool columns beyond the ledger snapshot: the wire status (dequeue-order
#: records keep 304/406/..., the ledger keeps the pre-rollback status), the
#: politeness slot, the retirement flag, the document spans and the
#: driver-bookkeeping link flag (plus content_type/headers/fresh/payload
#: when output_dir is set — the cache view columns)
SPOOL_EXTRA_COLS = [
    "wire_status",
    "fetch_clock_ms",
    "retired",
    "has_doc",
    "spans",
    "has_link",
    "crawl_instance",
]


class CrawlPipeline:
    """Driver for the round loop (≙ crawl_perform, libcrawl/crawler.c:28-71).

    Driver-memory contract (the 10^10 design): per-round outputs stream to
    partitioned parquet under ``spool_dir`` (``round=<r>/`` per round — the
    resumable-output layout); the driver holds ONLY per-host politeness
    counters (≙ crawl_root), the bounded lazy-removal hash set (cleared at
    every compaction), and per-round metric dicts.  Crawl records, the
    ledger archive and the document table are never accumulated in driver
    lists; ``results()`` re-reads the spool.
    """

    def __init__(
        self,
        tables: dict[str, pa.Table],
        cfg: CrawlConfig | None = None,
        budget: int | None = None,
        output_dir: str | None = None,
        checkpoint_every: int = 0,
        compact_every: int = 16,
        driver_plane_threshold: int | None = None,
        bookkeep_threshold: int | None = None,
        spool_dir: str | None = None,
        web_store_dir: str | None = None,
        web_store_buckets: int = 16,
        instance_id: str | None = None,
    ):
        #: ≙ crawl_instance (db.c:354, 1005) — which crawler instance owns
        #: each round's rows; stamped per-row in the spool and recorded in
        #: the checkpoint manifest (observability for at-scale debugging)
        self.instance_id = instance_id or "crawl-0"
        self.cfg = cfg or CrawlConfig()
        self.budget = budget if budget is not None else self.cfg.per_host_budget
        self.output_dir = output_dir
        self.checkpoint_every = checkpoint_every
        self.compact_every = compact_every
        self.driver_plane_threshold = (
            driver_plane_threshold
            if driver_plane_threshold is not None
            else _default_driver_plane_threshold()
        )
        #: rows above which the post-round bookkeeping pull goes distributed.
        #: Deliberately far below ``driver_plane_threshold``: the LOCAL pull
        #: materializes Python string lists at ~1-2 KB/row transient (a 4M-row
        #: round spiked driver RSS by ~3 GB on the 16M evidence run), while
        #: the distributed pass costs one sub-second Ray execution and lands
        #: O(#hosts x #states) rows on the driver regardless of round size.
        self.bookkeep_threshold = (
            bookkeep_threshold
            if bookkeep_threshold is not None
            else min(500_000, self.driver_plane_threshold)
        )
        if spool_dir is None:
            base = output_dir or tempfile.mkdtemp(prefix="anansi_spool_")
            spool_dir = os.path.join(base, "spool")
        self.spool_dir = spool_dir
        self.spooled_rounds: list[int] = []

        robots = {
            r["host"]: r.get("robots_disallow") or []
            for r in tables["hosts"].to_pylist()
            if r.get("robots_disallow")
        }
        self.robots = robots
        self.robots_ref = ray.put(robots)
        # ≙ crawl_root: host -> (earliest_update_ms, rate_ms, eligible);
        # driver-dict backend by default, sharded actors for 10^8+ hosts
        # (cfg.host_state_backend) — identical five-op surface either way
        self.hosts = make_host_state(
            self.cfg.host_state_backend,
            self.cfg.default_rate_ms,
            self.cfg.host_state_shards,
        )
        self.hosts.ensure_hosts(
            [(r["host"], int(r["rate_ms"])) for r in tables["hosts"].to_pylist()]
        )
        # fetch-side web access: the bucketed partitioned store (S6-S8
        # layout — scheduled METADATA hash-exchanges to the bucket owning
        # its cache key, payloads never move; the 10^10 shape) when
        # ``web_store_dir`` is set, else the broadcast Arrow table (plasma
        # zero-copy across a node's workers; fine to ~10^6 URLs/node)
        self.web_store_dir = None
        self.web_ref = None
        if web_store_dir is not None:
            from anansi_ray.sources.webstore import bucketize_web

            from anansi_ray.sources.webstore import META_NAME

            if not os.path.exists(os.path.join(web_store_dir, META_NAME)):
                bucketize_web(tables["web"], web_store_dir, n_buckets=web_store_buckets)
            self.web_store_dir = web_store_dir
        else:
            # combine chunks ONCE here so workers never copy it
            self.web_ref = ray.put(prepare_broadcast_table(tables["web"]))
        self.seen = SeenSet(self.cfg.seen_shards, backend=self.cfg.seen_backend)
        self.round = 0
        #: fetched hashes pending compaction live in SHARD ACTORS (same
        #: layout as the seen set), probed by the due filter via per-batch
        #: contains RPCs — the driver holds only a row counter, and nothing
        #: is re-broadcast per round (round-2 anti-pattern #1)
        self.fetched: SeenSet | None = None  # lazy: distributed plane only
        self.removed_count = 0
        #: force a compaction (clearing the fetched shards) beyond this
        #: size even between compact_every boundaries — bounds shard memory
        #: regardless of round sizes
        self.removed_cap = 2_000_000
        self.round_metrics: list[dict] = []  # per-round lineage/metrics (A5)

        # bootstrap: seeds → frontier rows (S1/S2, ≙ crawler-add, add.c:117-177)
        boot: dict[str, dict] = {}
        for s in tables["seeds"].to_pylist():
            c = canonicalize(s["url"])
            if c is None or "://" not in c:
                continue
            h = cache_key(c)
            if h in boot:
                if s["force"]:
                    boot[h]["state"] = "FORCE"
                continue
            _, rh, host = root_of(c)
            boot[h] = {
                "url": c,
                "url_hash": h,
                "host": host,
                "root_hash": rh,
                "depth": 0,
                "priority": 0.0,
                "state": "FORCE" if s["force"] else "NEW",
                "status": 0,
                "next_fetch_ms": 0,
                "error_count": 0,
                "soft_error_count": 0,
                "last_ttl_s": 0,
                "added_round": 0,
                "updated_ms": 0,
            }
        if boot:
            self.seen.add_if_new(list(boot.keys()))
            from collections import Counter as _C

            boot_hosts = _C(v["host"] for v in boot.values())
            self.hosts.ensure_hosts(
                [(h, self.cfg.default_rate_ms) for h in boot_hosts]
            )
            self.hosts.add_eligible(list(boot_hosts.items()))
        seed_tbl = (
            pa.Table.from_pylist(list(boot.values()), schema=LEDGER_SCHEMA)
            if boot
            else _empty_ledger_table()
        )
        #: dual-plane frontier: a driver-resident Arrow table while the
        #: eligible set fits `driver_plane_threshold` (metadata-only rows,
        #: memory-derived bound — zero Ray executions to plan a round), a
        #: Dataset once it crosses (the 10^10 shape; the switch is monotone)
        self.frontier: pa.Table | rd.Dataset = seed_tbl

    # ------------------------------------------------------------------
    def run_round(self) -> int:
        """Execute one round; returns the number of fetches performed."""
        import time as _time

        _t0 = _time.monotonic()
        cfg = self.cfg

        # due-host selection: pure driver bookkeeping over per-host
        # eligibility counters (≙ the dequeue query's WHERE gates,
        # db.c:683-692).  Every host with eligible rows is scheduled each
        # round; causality/politeness live in the per-row slot timestamps.
        due_hosts = self.hosts.due_hosts()
        if not due_hosts:
            return 0

        # control-plane sizing: the scheduling/merge steps are metadata-only
        # (no payloads), so below `driver_plane_threshold` eligible rows they
        # run vectorized on the driver over the driver-resident frontier
        # table — zero Ray executions to plan a round (Ray's per-execution
        # latency otherwise dominates small/medium waves).  Above the
        # threshold the frontier converts to a Dataset (monotone) and the
        # distributed scan-scheduler takes over (the 10^10 shape); both
        # implement the identical ordering/merge rules.
        eligible_total = self.hosts.eligible_total()
        driver_plane = eligible_total <= self.driver_plane_threshold
        if not driver_plane and isinstance(self.frontier, pa.Table):
            self.frontier = _from_arrow_local(self.frontier)
        if driver_plane and isinstance(self.frontier, rd.Dataset):
            # stay distributed once crossed — converting back would thrash
            driver_plane = False

        refetch = cfg.refetch_horizon_ms is not None
        if driver_plane:
            # the driver plane compacts eagerly per round, so there is no
            # lazy-removal set to filter against
            due_tbl = _due_filter_table(self.frontier, due_hosts, set(), refetch)
            if due_tbl.num_rows == 0:
                return 0
            sched_tbl = _schedule_on_driver(
                due_tbl, due_hosts, self.budget, keys=order_keys(cfg)
            )
            nslices = max(1, min(64, sched_tbl.num_rows // 256 or 1))
            step = (sched_tbl.num_rows + nslices - 1) // nslices
            scheduled = _from_arrow_local(
                [
                    sched_tbl.slice(i, step)
                    for i in range(0, sched_tbl.num_rows, step)
                ]
            )
        else:
            # distributed plane: segmented-scan scheduler — same O1 order and
            # causal slots, but per-task memory is one batch regardless of
            # hub-host skew (a groupby(host).map_groups would pin a hub's
            # whole due set to one task; _make_scheduler remains for that
            # simpler shape)
            from anansi_ray.pipelines.scan_scheduler import schedule_scan

            due_ref = ray.put(pa.array(list(due_hosts), pa.string()))
            shards = (
                self.fetched.shards
                if (self.fetched is not None and self.removed_count)
                else None
            )
            due = self.frontier.map_batches(
                _make_due_filter(due_ref, shards, refetch=refetch),
                batch_format="pyarrow",
            )
            scheduled = schedule_scan(due, due_hosts, self.budget, keys=order_keys(cfg))
        _t_sched = _time.monotonic()
        _rss_probe("sched")
        if self.web_store_dir is not None:
            from anansi_ray.sources.webstore import fetch_bucketed

            fetched = fetch_bucketed(scheduled, self.web_store_dir, self.robots, cfg)
        elif cfg.fetch_actor_pool:
            # ST3 actor-pool variant (≙ one CRAWL context per thread):
            # session/index state loads once per ACTOR; pays actor startup
            # per execution, so the cached-task default wins for many small
            # rounds while this wins for few huge ones
            from anansi_ray.stages.fetch import Fetcher

            fetched = scheduled.map_batches(
                Fetcher,
                fn_constructor_args=(self.web_ref, self.robots_ref, cfg),
                concurrency=(1, cfg.fetch_concurrency),
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
            )
        else:
            fetched = scheduled.map_batches(
                make_fetch_fn(self.web_ref, self.robots_ref, cfg),
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
            )
        trans = fetched.map_batches(
            _Transition(cfg, keep_payload=bool(self.output_dir)),
            batch_format="pyarrow",
        )

        if getattr(self, "debug_stats", False):
            trans = trans.materialize()
            print(trans.stats()[:3000], flush=True)
        _t_fetch = _time.monotonic()  # pipeline is lazy; fetch runs fused
        # into the single spool execution below ("spool" phase ≙ the round)

        horizon = cfg.refetch_horizon_ms

        # ---- spool sink: the round's ONE Dataset execution ---------------
        # fetch → transition → projection → partitioned-parquet write as a
        # single streaming pass.  The projection carries the ledger
        # snapshot (unchanged-preserving status), wire status for the
        # dequeue-order records, retirement flag, document spans, has_link,
        # the canonicalized candidate links (cand), and — when output_dir
        # is set — the cache columns.  documents / cache / frontier
        # expansion / horizon re-admission are all column-pruned READS of
        # this file; there is no materialize barrier and no second pass
        # over the fetched rows.
        rdir = os.path.join(self.spool_dir, f"round={self.round}")
        if os.path.exists(rdir):
            shutil.rmtree(rdir)  # stale copy from a pre-crash run

        trans.map_batches(
            _make_spool_project(
                horizon,
                cfg.max_depth,
                with_cache=bool(self.output_dir),
                instance_tag=f"{self.instance_id}:{self.round}",
            ),
            batch_format="pyarrow",
        ).write_parquet(rdir)
        _t_spool0 = _time.monotonic()
        _rss_probe("spool-write")

        # ---- driver bookkeeping: a LOCAL column-pruned read of the round
        # dir just written (url_hash for lazy removal, host/clock for
        # politeness counters, state for metrics, next_fetch for horizon
        # cycling, has_link flag) — the same few columns round 2 pulled
        # through a whole extra Ray execution; payloads / spans / links
        # never reach the driver either way.  At scale even those few
        # columns are too many rows for the driver, so the pull is
        # SIZE-GATED: rounds above `driver_plane_threshold` rows instead
        # run one distributed bookkeeping pass whose batches register
        # their url_hashes straight into the fetched shards and reduce to
        # per-(host, state) partials — driver traffic becomes O(#hosts),
        # never O(#fetched)
        import pyarrow.dataset as pads

        n_fetched = 0
        if os.path.isdir(rdir) and any(
            f.endswith(".parquet") for f in os.listdir(rdir)
        ):
            n_fetched = pads.dataset(rdir).count_rows()  # parquet metadata only
        if n_fetched == 0:
            shutil.rmtree(rdir, ignore_errors=True)
            return 0

        meta = None
        local_meta = driver_plane or n_fetched <= self.bookkeep_threshold
        if not local_meta and self.fetched is None:
            self.fetched = SeenSet(self.cfg.seen_shards, backend="exact")
        if local_meta:
            meta = pads.dataset(rdir).to_table(
                columns=[
                    "url_hash",
                    "host",
                    "state",
                    "fetch_clock_ms",
                    "next_fetch_ms",
                    "has_link",
                ]
            )
            st = (
                meta.select(["state"]).group_by("state").aggregate([([], "count_all")])
            )
            states_mix = dict(
                zip(
                    st["state"].to_pylist(),
                    (int(c) for c in st["count_all"].to_pylist()),
                )
            )
            agg = (
                meta.select(["host", "fetch_clock_ms"])
                .group_by("host")
                .aggregate(
                    [("fetch_clock_ms", "max"), ("fetch_clock_ms", "count")]
                )
            )
            host_fetch = list(
                zip(
                    agg["host"].to_pylist(),
                    (int(t) for t in agg["fetch_clock_ms_max"].to_pylist()),
                    (int(c) for c in agg["fetch_clock_ms_count"].to_pylist()),
                )
            )
            hosts_touched = agg.num_rows
            back_pairs: list[tuple[str, int]] = []
            if horizon is not None:
                back_meta = meta.filter(
                    pc.less_equal(meta["next_fetch_ms"], horizon)
                )
                if back_meta.num_rows:
                    cnts = (
                        back_meta.select(["host"])
                        .group_by("host")
                        .aggregate([([], "count_all")])
                    )
                    back_pairs = list(
                        zip(
                            cnts["host"].to_pylist(),
                            (int(c) for c in cnts["count_all"].to_pylist()),
                        )
                    )
            has_links = pc.any(meta["has_link"]).as_py()
        else:
            bk = self._bookkeep_round_distributed(rdir, horizon)
            by_state = (
                bk.select(["state", "n"]).group_by("state").aggregate([("n", "sum")])
            )
            states_mix = dict(
                zip(
                    by_state["state"].to_pylist(),
                    (int(v) for v in by_state["n_sum"].to_pylist()),
                )
            )
            by_host = bk.group_by("host").aggregate(
                [("max_clock", "max"), ("n", "sum"), ("n_back", "sum")]
            )
            host_fetch = list(
                zip(
                    by_host["host"].to_pylist(),
                    (int(t) for t in by_host["max_clock_max"].to_pylist()),
                    (int(c) for c in by_host["n_sum"].to_pylist()),
                )
            )
            hosts_touched = by_host.num_rows
            back_pairs = [
                (h, int(c))
                for h, c in zip(
                    by_host["host"].to_pylist(),
                    by_host["n_back_sum"].to_pylist(),
                )
                if int(c) > 0
            ]
            has_links = bool(pc.sum(bk["n_links"]).as_py())
        _t_meta = _time.monotonic()
        _rss_probe("meta")
        # per-partition lineage marker (rows + state mix): a round dir is
        # complete iff its _MANIFEST exists — a killed writer leaves no
        # marker and the re-run overwrites the whole dir
        with open(os.path.join(rdir, "_MANIFEST.json"), "w") as f:
            json.dump(
                {"round": self.round, "rows": n_fetched, "states": states_mix},
                f,
            )
        self.spooled_rounds.append(self.round)
        _t_spool = _time.monotonic()
        _rss_probe("manifest")

        # politeness + eligibility bookkeeping (≙ crawl_root updates)
        self.hosts.apply_fetch(host_fetch)
        if isinstance(self.frontier, pa.Table):
            # driver plane compacts eagerly: drop the fetched rows now
            # (vectorized is_in over ≤ threshold rows), no lazy-removal set
            fetched_mask = pc.is_in(
                self.frontier["url_hash"],
                value_set=meta["url_hash"].combine_chunks(),
            )
            self.frontier = self.frontier.filter(pc.invert(fetched_mask))
        else:
            if self.fetched is None:
                self.fetched = SeenSet(self.cfg.seen_shards, backend="exact")
            if local_meta:
                # small round: driver-side add is one RPC fan-out
                self.fetched.add_if_new(meta["url_hash"].to_pylist())
            # (large rounds already registered worker-side in the pass)
            self.removed_count += n_fetched

        if horizon is not None:
            # incremental mode: rows due again before the horizon cycle back
            # into the frontier; only beyond-horizon rows retired to the
            # spool above
            if back_pairs:
                self.hosts.add_eligible(back_pairs)
                if isinstance(self.frontier, pa.Table):
                    # the just-written spool round already holds the ledger
                    # rows; a local column-pruned read beats another Ray pass
                    import pyarrow.dataset as pads

                    back_tbl = pads.dataset(rdir).to_table(
                        columns=LEDGER_COLS, filter=~pads.field("retired")
                    )
                    self.frontier = pa.concat_tables(
                        [self.frontier, back_tbl], promote_options="default"
                    )
                else:
                    # drop the superseded copies first, then re-admit via a
                    # column-pruned distributed READ of the spool round just
                    # written (the spool stores the ledger status already,
                    # so no re-scan of the fetch pipeline is needed)
                    self._compact()
                    back_ds = rd.read_parquet(
                        rdir, columns=LEDGER_COLS
                    ).map_batches(
                        lambda b, h=horizon: b.filter(
                            pc.less_equal(b["next_fetch_ms"], h)
                        ),
                        batch_format="pyarrow",
                    )
                    self.frontier = self.frontier.union(back_ds)

        # frontier expansion: candidate links come out of the spool round
        # just written (the projection already canonicalized them into the
        # ``cand`` list column) — a column-pruned read replaces the former
        # dedicated expand execution over a materialized ``trans``.
        # Rows without links carry empty lists, which the flatten drops, so
        # no filter pushdown is needed.
        new_tbl = None
        pairs: list[tuple[str, int]] = []
        n_new = 0
        if has_links:
            rnd = self.round + 1
            if driver_plane:
                cand_tbl = _flatten_cand(
                    pads.dataset(rdir).to_table(columns=["cand"])
                )
                if cand_tbl.num_rows:
                    merged = _merge_candidates_on_driver(cand_tbl)
                    keep = self.seen.add_if_new(merged["url_hash"].to_pylist())
                    merged = merged.filter(pa.array(keep))
                    if merged.num_rows:
                        new_tbl = _new_ledger_rows(merged, rnd)
                if new_tbl is not None:
                    pairs = _host_count_pairs(new_tbl)
                    n_new = new_tbl.num_rows
            else:
                # the expansion wave NEVER lands on the driver: it stays a
                # Dataset end-to-end (at 10^10-frontier scale a round's wave
                # is itself billions of rows); the driver receives only the
                # per-host counts, reduced per block before the pull
                fresh = (
                    rd.read_parquet(rdir, columns=["cand"])
                    .map_batches(_flatten_cand, batch_format="pyarrow")
                    .map_batches(_add_cand_part, batch_format="pyarrow")
                    .groupby("part")
                    .map_groups(_merge_cand_partition, batch_format="pyarrow")
                    .map_batches(
                        make_seen_filter(self.seen.shards), batch_format="pyarrow"
                    )
                    .map_batches(
                        lambda b, r=rnd: _new_ledger_rows(b, r), batch_format="pyarrow"
                    )
                    .materialize()
                )
                # the groupby's range partitioner emits zero-row blocks with
                # an EMPTY schema for keyless partitions; strip them here
                # (driver-local metadata filter) so they never reach the
                # frontier union
                fresh = _drop_empty_blocks(fresh)
                n_new = fresh.count()  # block metadata only
                if n_new:
                    pairs = _host_counts_distributed(fresh)
                    self.frontier = self.frontier.union(fresh)
            if pairs:
                self.hosts.ensure_hosts(
                    [(h, self.cfg.default_rate_ms) for h, _n in pairs]
                )
                self.hosts.add_eligible(pairs)
                if new_tbl is not None:
                    # driver plane: append to the driver-resident table
                    self.frontier = pa.concat_tables(
                        [self.frontier, new_tbl], promote_options="default"
                    )

        # per-round lineage/metrics row (A5; ≙ thread liveness counters —
        # here: what a monitoring plane would scrape per round)
        self.round_metrics.append(
            {
                "round": self.round,
                "fetches": n_fetched,
                "new_urls": n_new,
                "states": states_mix,
                "hosts_touched": hosts_touched,
                "plane": "driver" if driver_plane else "distributed",
                "duration_s": round(_time.monotonic() - _t0, 3),
                "phase_s": {
                    "schedule": round(_t_sched - _t0, 3),
                    "fetch": round(_t_fetch - _t_sched, 3),
                    "spool": round(_t_spool0 - _t_fetch, 3),
                    "meta": round(_t_meta - _t_spool0, 3),
                    "expand": round(_time.monotonic() - _t_spool, 3),
                },
            }
        )

        _rss_probe("expand")
        self.round += 1
        if isinstance(self.frontier, rd.Dataset):
            # bound plan depth: an unmaterialized union chain makes every
            # subsequent execution replay all prior rounds' unions — the
            # per-round materialize is one linear pass over frontier-size
            # blocks (the due filter already pays that) and keeps the DAG
            # a single source
            self.frontier = _drop_empty_blocks(self.frontier.materialize())
        if (
            self.compact_every and self.round % self.compact_every == 0
        ) or self.removed_count > self.removed_cap:
            self._compact()
        if self.checkpoint_every and self.round % self.checkpoint_every == 0:
            self.checkpoint()
        _rss_probe("round-end")
        return n_fetched

    def _compact(self) -> None:
        """Physically drop lazily-removed rows from the frontier (LSM merge).

        The driver-plane table compacts eagerly per round, so this only has
        work to do on the distributed plane."""
        if isinstance(self.frontier, pa.Table):
            self.removed_count = 0
            return
        if not self.removed_count or self.fetched is None:
            self.frontier = _drop_empty_blocks(self.frontier.materialize())
            return
        self.frontier = _drop_empty_blocks(
            self.frontier.map_batches(
                _make_drop_fetched(self.fetched.shards), batch_format="pyarrow"
            ).materialize()
        )
        self.fetched.clear()
        self.removed_count = 0

    def request_stop(self) -> None:
        """F9 terminate gate (≙ the crawld kill flag checked by
        thread_prefetch_ before each fetch, crawler/thread.c:356-370): the
        round loop finishes the in-flight round, checkpoints if configured,
        and returns — resume continues from the last checkpoint."""
        self.stop_requested = True

    # ------------------------------------------------------------------
    def run(self, max_rounds: int | None = None) -> dict:
        max_rounds = max_rounds or self.cfg.max_rounds
        fetches = 0
        for _ in range(max_rounds):
            if getattr(self, "stop_requested", False):
                if self.checkpoint_every:
                    self.checkpoint()
                break
            n = self.run_round()
            if n == 0:
                break
            fetches += n
        return self.results(total_fetches=fetches)

    # ------------------------------------------------------------------
    # spool readers — the driver-side views over the per-round parquet
    # ------------------------------------------------------------------
    def _read_spool(self, columns=None, filt=None) -> pa.Table | None:
        """Column-pruned read over exactly the rounds this crawl spooled
        (stale round dirs from an earlier run of the same spool are
        ignored; re-run rounds overwrite their dir)."""
        import pyarrow.dataset as pads

        dirs = [
            os.path.join(self.spool_dir, f"round={r}") for r in self.spooled_rounds
        ]
        dirs = [d for d in dirs if os.path.isdir(d)]
        if not dirs:
            return None
        ds = pads.dataset([pads.dataset(d) for d in dirs])
        return ds.to_table(columns=columns, filter=filt)

    def _bookkeep_round_distributed(self, rdir: str, horizon) -> pa.Table:
        """One distributed pass over the spool round just written: every
        batch registers its url_hashes straight into the fetched shards
        (worker → shard-actor RPCs, result ignored, ray.get barrier inside
        the task) and reduces itself to per-(host, state) partials
        (n, max fetch clock, rows due back before the horizon, link
        flags).  The driver merges the partials — O(#hosts x #states)
        rows per round, never O(#fetched)."""
        from anansi_ray.state.seen import AddRouter

        shards = self.fetched.shards
        hz = horizon

        def bookkeep(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or batch.num_columns == 0:
                return pa.table(
                    {
                        "host": pa.array([], pa.string()),
                        "state": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64()),
                        "max_clock": pa.array([], pa.int64()),
                        "n_back": pa.array([], pa.int64()),
                        "n_links": pa.array([], pa.int64()),
                    }
                )
            AddRouter(shards).add(batch["url_hash"].to_pylist())
            back = (
                pc.less_equal(batch["next_fetch_ms"], hz)
                if hz is not None
                else pa.array(np.zeros(batch.num_rows, dtype=bool))
            )
            t = pa.table(
                {
                    "host": batch["host"],
                    "state": batch["state"],
                    "clock": batch["fetch_clock_ms"],
                    "back": pc.cast(back, pa.int64()),
                    "link": pc.cast(batch["has_link"], pa.int64()),
                }
            )
            g = t.group_by(["host", "state"]).aggregate(
                [
                    ("clock", "count"),
                    ("clock", "max"),
                    ("back", "sum"),
                    ("link", "sum"),
                ]
            )
            return g.rename_columns(
                ["host", "state", "n", "max_clock", "n_back", "n_links"]
            )

        # combiner-before-exchange twice over: per-BLOCK (host, state)
        # partials from ``bookkeep``, then a distributed groupby reduce, so
        # the driver pull is O(#hosts x #states) even when the round has
        # thousands of blocks (at 10^10-frontier scale the per-block partials
        # alone are #blocks x #hosts rows — too many for one driver concat)
        from ray.data.aggregate import Max as _AggMax
        from ray.data.aggregate import Sum as _AggSum

        reduced = (
            rd.read_parquet(
                rdir,
                columns=[
                    "url_hash",
                    "host",
                    "state",
                    "fetch_clock_ms",
                    "next_fetch_ms",
                    "has_link",
                ],
            )
            .map_batches(bookkeep, batch_format="pyarrow")
            .groupby(["host", "state"])
            .aggregate(
                _AggSum("n", alias_name="n"),
                _AggMax("max_clock", alias_name="max_clock"),
                _AggSum("n_back", alias_name="n_back"),
                _AggSum("n_links", alias_name="n_links"),
            )
            .materialize()
        )
        parts = [t for t in ray.get(reduced.to_arrow_refs()) if t.num_rows]
        return pa.concat_tables(parts).select(
            ["host", "state", "n", "max_clock", "n_back", "n_links"]
        )

    def _frontier_table(self) -> pa.Table:
        if isinstance(self.frontier, pa.Table):
            return self.frontier
        return _ds_to_table(self.frontier) or _empty_ledger_table()

    def ledger_table(self) -> pa.Table:
        """Full ledger = remaining frontier ∪ retired spool rows.

        A hash appears retired at most once (retirement means its
        next_fetch left the refetch horizon, so it never re-enters the
        frontier), making the union exact."""
        import pyarrow.dataset as pads

        self._compact()
        parts = [self._frontier_table()]
        retired = self._read_spool(
            columns=LEDGER_COLS, filt=pads.field("retired")
        )
        parts.append(retired)
        parts = [t for t in parts if t is not None and t.num_rows]
        if not parts:
            return _empty_ledger_table()
        return pa.concat_tables(parts, promote_options="default")

    def results(self, total_fetches: int = 0) -> dict:
        """Assemble the crawl outputs from the spool.

        This is the small-scale/test materialization; at production scale
        consumers read the ``spool_dir`` parquet directly (partitioned by
        round — the resumable-output layout) instead of driver tables.
        """
        import pyarrow.dataset as pads

        rec = self._read_spool(
            columns=["fetch_clock_ms", "url_hash", "url", "state", "wire_status"]
        )
        if rec is not None and rec.num_rows:
            rec = rec.rename_columns(
                ["fetch_clock_ms", "url_hash", "url", "state", "status"]
            )
            order = pc.sort_indices(
                rec,
                sort_keys=[("fetch_clock_ms", "ascending"), ("url_hash", "ascending")],
            )
            rec = rec.take(order)
            rec = rec.add_column(0, "seq", pa.array(range(rec.num_rows), pa.int64()))
        else:
            rec = None
        docs = self._read_spool(
            columns=["url_hash", "spans"], filt=pads.field("has_doc")
        )
        if docs is not None and docs.num_rows:
            docs = docs.rename_columns(["doc_id", "spans"])
        else:
            docs = None
        return {
            "expected_crawl": rec,
            "documents": docs,
            "ledger": self.ledger_table(),
            "rounds": self.round,
            "fetches": total_fetches,
            "metrics": list(self.round_metrics),
        }

    # ------------------------------------------------------------------
    # checkpoint / resume (per-round lineage manifest, SURVEY §4)
    # ------------------------------------------------------------------
    def checkpoint(self) -> str:
        ckdir = os.path.join(self.cfg.checkpoint_dir, f"round={self.round}")
        tmp = ckdir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        if isinstance(self.frontier, pa.Table):
            frontier_rows = self.frontier.num_rows
            pq.write_table(self.frontier, os.path.join(tmp, "frontier.parquet"))
        else:
            # distributed plane: the frontier NEVER lands on the driver —
            # workers write it as a partitioned parquet directory (the
            # lazy-removal state travels separately as the fetched-shard
            # dumps, so the raw Dataset is the exact complement)
            frontier_rows = self.frontier.count()  # block metadata only
            if frontier_rows:
                self.frontier.write_parquet(os.path.join(tmp, "frontier"))
            else:
                pq.write_table(
                    _empty_ledger_table(), os.path.join(tmp, "frontier.parquet")
                )
        for i, blob in enumerate(self.seen.dump()):
            with open(os.path.join(tmp, f"seen_{i}.bin"), "wb") as f:
                f.write(blob)
        if self.fetched is not None and self.removed_count:
            for i, blob in enumerate(self.fetched.dump()):
                with open(os.path.join(tmp, f"fetched_{i}.bin"), "wb") as f:
                    f.write(blob)
        # the per-round spool IS the durable bulk state; the manifest only
        # references it (per-partition lineage: round dirs are immutable
        # once written, re-run rounds overwrite their whole dir)
        manifest = {
            "round": self.round,
            "frontier_rows": frontier_rows,
            "host_state": self.hosts.snapshot(),
            "removed_count": self.removed_count,
            "fetched_shards": (
                self.cfg.seen_shards
                if (self.fetched is not None and self.removed_count)
                else 0
            ),
            "seen_shards": self.cfg.seen_shards,
            "round_metrics": self.round_metrics,
            "spool_dir": os.path.abspath(self.spool_dir),
            "spooled_rounds": list(self.spooled_rounds),
            "crawl_instance": self.instance_id,
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        if os.path.exists(ckdir):
            shutil.rmtree(ckdir)
        os.rename(tmp, ckdir)  # atomic commit (≙ tmpfile+rename, disk.c:144-170)
        return ckdir

    def restore(self, ckdir: str) -> None:
        with open(os.path.join(ckdir, "manifest.json")) as f:
            manifest = json.load(f)
        self.round = manifest["round"]
        self.round_metrics = manifest.get("round_metrics", [])
        self.hosts.restore(manifest["host_state"])
        self.removed_count = int(manifest.get("removed_count", 0))
        n_fetched_shards = int(manifest.get("fetched_shards", 0))
        if n_fetched_shards:
            self.fetched = SeenSet(n_fetched_shards, backend="exact")
            blobs = []
            for i in range(n_fetched_shards):
                with open(os.path.join(ckdir, f"fetched_{i}.bin"), "rb") as f:
                    blobs.append(f.read())
            self.fetched.restore(blobs)
        else:
            self.fetched = None
            self.removed_count = 0
        # resume on the plane the size dictates: driver table below the
        # threshold, Dataset above.  A directory checkpoint (written by the
        # distributed plane) is read back distributedly — the frontier
        # never transits the driver in either direction.
        fdir = os.path.join(ckdir, "frontier")
        if os.path.isdir(fdir):
            ds = _drop_empty_blocks(rd.read_parquet(fdir).materialize())
            if ds.count() <= self.driver_plane_threshold:
                self.frontier = _ds_to_table(ds) or _empty_ledger_table()
            else:
                self.frontier = ds
        else:
            frontier_tbl = pq.read_table(os.path.join(ckdir, "frontier.parquet"))
            if frontier_tbl.num_rows <= self.driver_plane_threshold:
                self.frontier = frontier_tbl
            else:
                self.frontier = _from_arrow_local(frontier_tbl).materialize()
        self.spool_dir = manifest["spool_dir"]
        self.spooled_rounds = list(manifest["spooled_rounds"])
        blobs = []
        for i in range(manifest["seen_shards"]):
            with open(os.path.join(ckdir, f"seen_{i}.bin"), "rb") as f:
                blobs.append(f.read())
        self.seen.restore(blobs)

    @staticmethod
    def latest_checkpoint(checkpoint_dir: str) -> str | None:
        if not os.path.isdir(checkpoint_dir):
            return None
        rounds = []
        for name in os.listdir(checkpoint_dir):
            if name.startswith("round=") and not name.endswith(".tmp"):
                if os.path.exists(os.path.join(checkpoint_dir, name, "manifest.json")):
                    rounds.append(int(name.split("=")[1]))
        if not rounds:
            return None
        return os.path.join(checkpoint_dir, f"round={max(rounds)}")
