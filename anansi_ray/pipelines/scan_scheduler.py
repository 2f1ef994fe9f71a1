"""Distributed segmented-scan politeness scheduler (the hub-skew path).

``groupby(host).map_groups(schedule)`` puts each host's whole due set into
ONE task — a dbpedia-sized hub with 10^8 due rows would need that task to
hold 10s of GB.  This module schedules the same O1 order with the same
causal slot chaining as a **segmented prefix scan**, which parallelizes
over arbitrary batch boundaries:

    within one host, rows j = 0..n-1 in O1 order
    (state='NEW' first, then next_fetch, then url_hash — db.c:691):

        t_j = max(t_{j-1} + rate, nf_j),   t_{-1} + rate = eu
            = rate*j + max(eu, max_{k<=j} (nf_k - rate*k))

    so the per-row slot is a prefix-max over g_k = nf_k - rate*k —
    an associative scan.

Three phases:

1. distributed sort on (host, _old, next_fetch_ms, url_hash) — the same
   exchange the groupby would do;
2. one map pass emitting per-(batch × host-segment) partials
   (segment-first sort key, row count, local max of g) — metadata only;
3. driver combine (order segments by their first sort key per host,
   accumulate row offsets and prefix-max carries — O(#segments), tiny),
   then a finalize map pass that computes exact slots from the broadcast
   (host, segment-first-hash) → (offset, carry) table.

Bit-identical to the sequential chaining for any batch partitioning, and
per-task memory is one batch regardless of host skew.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_SEG_META_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("first_old", pa.bool_()),
        ("first_priority", pa.float64()),
        ("first_depth", pa.int32()),
        ("first_nf", pa.int64()),
        ("first_hash", pa.string()),
        ("n", pa.int64()),
        ("g_max_local", pa.int64()),
    ]
)

#: mapping from order-key column name to its first-row meta field — the
#: driver combine re-orders segments by the SAME key the distributed sort
#: used (any total order works; both passes and the combine must agree)
_META_FIELD = {
    "_old": "first_old",
    "priority": "first_priority",
    "depth": "first_depth",
    "next_fetch_ms": "first_nf",
    "url_hash": "first_hash",
}


def _add_old(batch: pa.Table) -> pa.Table:
    return batch.append_column("_old", pc.not_equal(batch["state"], "NEW"))


def _segments(batch: pa.Table):
    """Yield (host, start, end) contiguous host segments of a sorted batch.

    Boundary detection is one vectorized shifted-compare over the host
    column (the driver-plane scheduler's run-boundary kernel) — per-ROW
    Python would make these metadata passes the bottleneck at hub scale;
    the remaining loop is per SEGMENT."""
    n = batch.num_rows
    if n == 0:
        return
    host_arr = batch["host"].combine_chunks()
    bounds = np.ones(n, dtype=bool)
    if n > 1:
        bounds[1:] = pc.not_equal(
            host_arr.slice(1), host_arr.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(bounds)
    ends = np.append(starts[1:], n)
    hosts = host_arr.take(pa.array(starts, pa.int64())).to_pylist()
    yield from zip(hosts, starts, ends)


def _make_meta_pass(rate_ref):
    def meta(batch: pa.Table) -> pa.Table:
        rates = ray.get(rate_ref)
        nf = batch["next_fetch_ms"].to_numpy(zero_copy_only=False)
        rows = {k: [] for k in _SEG_META_SCHEMA.names}
        for host, s, e in _segments(batch):
            rate = rates[host][1]
            g = nf[s:e] - rate * np.arange(e - s, dtype=np.int64)
            rows["host"].append(host)
            rows["first_old"].append(bool(batch["_old"][s].as_py()))
            rows["first_priority"].append(
                float(batch["priority"][s].as_py())
                if "priority" in batch.column_names
                else 0.0
            )
            rows["first_depth"].append(
                int(batch["depth"][s].as_py())
                if "depth" in batch.column_names
                else 0
            )
            rows["first_nf"].append(int(nf[s]))
            rows["first_hash"].append(batch["url_hash"][s].as_py())
            rows["n"].append(e - s)
            rows["g_max_local"].append(int(g.max()))
        return pa.Table.from_pydict(rows, schema=_SEG_META_SCHEMA)

    return meta


def _combine_on_driver(meta: pa.Table, eu_rate: dict, keys) -> dict:
    """Order each host's segments by their first sort key; accumulate row
    offsets and prefix-max carries.  Returns {(host, first_hash): (offset,
    carry)} where carry = max(eu, rebased g-max of all earlier segments)."""
    order = pc.sort_indices(
        meta,
        sort_keys=[("host", "ascending")]
        + [(_META_FIELD[name], direction) for name, direction in keys],
    )
    meta = meta.take(order)
    out: dict = {}
    cur_host = None
    offset = 0
    carry = 0
    for row in meta.to_pylist():
        host = row["host"]
        if host != cur_host:
            cur_host = host
            offset = 0
            carry = eu_rate[host][0]  # eu
        out[(host, row["first_hash"])] = (offset, carry)
        rate = eu_rate[host][1]
        g_global = row["g_max_local"] - rate * offset
        carry = max(carry, g_global)
        offset += row["n"]
    return out


def _make_finalize_pass(rate_ref, seg_ref, budget: int | None):
    def finalize(batch: pa.Table) -> pa.Table:
        rates = ray.get(rate_ref)
        seg_info = ray.get(seg_ref)
        nf = batch["next_fetch_ms"].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        slots = np.zeros(n, dtype=np.int64)
        keep = np.ones(n, dtype=bool)
        for host, s, e in _segments(batch):
            rate = rates[host][1]
            offset, carry = seg_info[(host, batch["url_hash"][s].as_py())]
            idx_global = offset + np.arange(e - s, dtype=np.int64)
            g = nf[s:e] - rate * idx_global
            prefix = np.maximum.accumulate(np.maximum(g, carry))
            slots[s:e] = rate * idx_global + prefix
            if budget:
                keep[s:e] = idx_global < budget
        out = batch.drop_columns(["_old"]).append_column(
            "fetch_clock_ms", pa.array(slots, pa.int64())
        )
        if not keep.all():
            out = out.filter(pa.array(keep))
        return out

    return finalize


def schedule_scan(
    due: rd.Dataset, eu_rate: dict, budget: int | None = None, keys=None
) -> rd.Dataset:
    """Schedule a due Dataset: returns rows + exact ``fetch_clock_ms``.

    ``keys`` is the within-host order (default: the reference O1 key; the
    priority extension passes its own) — the segmented scan itself is
    order-agnostic as long as sort, meta pass and combine agree."""
    if keys is None:
        keys = [
            ("_old", "ascending"),
            ("next_fetch_ms", "ascending"),
            ("url_hash", "ascending"),
        ]
    rate_ref = ray.put(eu_rate)
    srt = (
        due.map_batches(_add_old, batch_format="pyarrow")
        .sort(
            ["host"] + [name for name, _d in keys],
            descending=[False] + [d == "descending" for _n, d in keys],
        )
        .materialize()
    )
    # batch_size=None ⇒ one batch per block on BOTH passes, so segment keys
    # (host, first url_hash in the batch's segment) align between them
    meta_tables = [
        t
        for t in ray.get(
            srt.map_batches(
                _make_meta_pass(rate_ref), batch_format="pyarrow", batch_size=None
            )
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not meta_tables:
        return srt.map_batches(
            lambda b: b.drop_columns(["_old"]).append_column(
                "fetch_clock_ms", pa.array([], pa.int64())
            ),
            batch_format="pyarrow",
        )
    meta = pa.concat_tables(meta_tables)
    seg_info = _combine_on_driver(meta, eu_rate, keys)
    seg_ref = ray.put(seg_info)
    return srt.map_batches(
        _make_finalize_pass(rate_ref, seg_ref, budget),
        batch_format="pyarrow",
        batch_size=None,
    )
