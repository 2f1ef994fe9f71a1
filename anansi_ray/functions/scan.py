"""Distributed ordered prefix scan (cumulative aggregate over a global
sort order) — the ``SUM(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)``
window family, expressed without ever materializing the dataset on the
driver.

Shape (one real exchange over the data + two tiny metadata reductions):

1. **Boundary pass** — per-batch ``(range_key, count)`` partials →
   ``groupby(range_key).sum`` → the driver picks ``n_parts`` equal-count
   range boundaries from the (small) distinct-key histogram.  The range
   key is a low-cardinality prefix of the sort order (e.g. the date of a
   (date, id) order), so the histogram is KB-sized no matter the corpus.
2. **Offset pass** — per-batch ``(part, sum_value)`` partials →
   ``groupby(part).sum`` → the driver computes the exclusive scan of the
   ``n_parts`` totals (an O(n_parts) loop) and broadcasts the offsets
   with ``ray.put``.
3. **Finish** — rows exchange once on ``part``; each partition kernel
   sorts by the full order tuple, cumulative-sums locally, and adds its
   part's broadcast offset.  Values are int64 (the caller scales floats
   to integer units first) so the result is exact and independent of
   reassociation.

At 100 TB: passes 1–2 move only combiner-sized partials; pass 3 is the
same coarse hash/range exchange every kernel in this repo uses, with
partition size = corpus / n_parts.  Skew is bounded by the range-key
histogram the driver already holds — a hot range key can be detected and
split (the boundaries are chosen at equal COUNT, not equal key span).

No reference counterpart (anansi has no window aggregates); this is an
engine extension for training-data pipelines (e.g. token-budget cutoffs:
"take documents in quality order until the running token total hits N").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from anansi_ray.arrowds import drop_empty_blocks as _drop_empty_blocks


def equal_count_boundaries(
    ds: rd.Dataset, range_col: str, n_parts: int
) -> np.ndarray:
    """Pass 1 of every ordered scan: equal-count range boundaries from the
    (small) distinct-range-key histogram.  ``boundaries[i]`` is the first
    range key of part ``i+1`` — tag rows with
    ``np.searchsorted(boundaries, key, side="right")``."""
    from ray.data.aggregate import Sum

    def key_hist(b: pa.Table) -> pa.Table:
        k = b[range_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(k, return_counts=True)
        return pa.table(
            {
                "k": pa.array(uniq, pa.int64()),
                "c": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    from anansi_ray.arrowds import stable_frame

    hist = stable_frame(
        ds.map_batches(key_hist, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas(),
        {"k": "int64", "c": "int64"},
    ).sort_values("k")
    keys = hist["k"].to_numpy()
    cum = hist["c"].to_numpy().cumsum()
    total = int(cum[-1]) if len(cum) else 0
    # boundaries[i] = first range key of part i+1 (searchsorted right-edges)
    targets = (np.arange(1, n_parts) * total) // n_parts
    bidx = np.searchsorted(cum, targets, side="right")
    return (
        np.unique(keys[np.minimum(bidx, len(keys) - 1)])
        if len(keys)
        else np.array([], np.int64)
    )


def ordered_prefix_sum(
    ds: rd.Dataset,
    range_col: str,
    order_cols: list[str],
    value_col: str,
    keep_cols: list[str],
    out_col: str = "running",
    n_parts: int = 64,
) -> rd.Dataset:
    """Exact distributed running total of ``value_col`` (int64) over the
    global order ``order_cols`` (whose first element ``range_col`` must be
    an int64-castable low-cardinality column used for range partitioning).

    Returns ``keep_cols + [out_col]``.  See module docstring for the
    three-pass shape."""
    from ray.data.aggregate import Sum

    # ---- pass 1: equal-count range boundaries from the range-key histogram
    boundaries = equal_count_boundaries(ds, range_col, n_parts)
    bounds_ref = ray.put(boundaries)

    from anansi_ray.arrowds import stable_frame

    def tag(b: pa.Table) -> pa.Table:
        bounds = ray.get(bounds_ref)
        k = b[range_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        part = np.searchsorted(bounds, k, side="right").astype(np.int32)
        return b.append_column("part", pa.array(part, pa.int32()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    # ---- pass 2: per-part totals → exclusive-scan offsets (tiny)
    def part_sums(b: pa.Table) -> pa.Table:
        p = b["part"].combine_chunks().to_numpy(zero_copy_only=False)
        v = b[value_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(p, return_inverse=True)
        # int64-exact grouped sum (bincount would route through float64)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, v)
        return pa.table(
            {
                "part": pa.array(uniq.astype(np.int32), pa.int32()),
                "s": pa.array(sums, pa.int64()),
            }
        )

    totals = stable_frame(
        tagged.map_batches(part_sums, batch_format="pyarrow")
        .groupby("part")
        .aggregate(Sum("s", alias_name="s"))
        .to_pandas(),
        {"part": "int64", "s": "int64"},
    ).sort_values("part")
    n_eff = int(boundaries.size) + 1
    offsets = np.zeros(n_eff, dtype=np.int64)
    psums = np.zeros(n_eff, dtype=np.int64)
    psums[totals["part"].to_numpy()] = totals["s"].to_numpy()
    offsets[1:] = np.cumsum(psums)[:-1]
    off_ref = ray.put(offsets)

    # ---- pass 3: one coarse exchange, block-local sorted cumsum + offset
    empty = pa.table(
        {
            **{c: pa.array([], pa.int64()) for c in keep_cols},
            out_col: pa.array([], pa.int64()),
        }
    )

    def finish(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        offs = ray.get(off_ref)
        part = int(group["part"][0].as_py())
        t = group.take(
            pc.sort_indices(group, sort_keys=[(c, "ascending") for c in order_cols])
        )
        v = t[value_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        run = np.cumsum(v) + offs[part]
        cols = {c: t[c] for c in keep_cols}
        cols[out_col] = pa.array(run, pa.int64())
        return pa.table(cols)

    return _drop_empty_blocks(
        tagged.groupby("part").map_groups(finish, batch_format="pyarrow").materialize()
    )


WM_SENTINEL = -(1 << 62)


def ordered_watermark(
    ds: rd.Dataset,
    range_col: str,
    order_cols: list[str],
    ts_col: str,
    keep_cols: list[str],
    hi_col: str = "wm_hi",
    n_parts: int = 64,
) -> rd.Dataset:
    """EXCLUSIVE running max of ``ts_col`` over the global order
    ``order_cols`` — the streaming-ingest watermark: row i's ``hi_col`` is
    the max event time among all STRICTLY EARLIER arrivals (``MAX(t) OVER
    (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)``).
    The first row in the global order gets ``hi_col = WM_SENTINEL`` and
    ``wm_valid = False``.

    Same three-pass shape as ``ordered_prefix_sum`` (max is associative):
    equal-count range boundaries on ``range_col`` (which must be a
    non-decreasing function of the order prefix, e.g. the arrival hour of
    an (arrival, id) order), per-part max partials exclusive-max-scanned
    on the driver (n_parts values), then ONE coarse exchange with a
    block-local sorted ``np.maximum.accumulate`` shifted by one and
    floored at the part's carry-in."""
    boundaries = equal_count_boundaries(ds, range_col, n_parts)
    bounds_ref = ray.put(boundaries)

    def tag(b: pa.Table) -> pa.Table:
        bounds = ray.get(bounds_ref)
        k = b[range_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        part = np.searchsorted(bounds, k, side="right").astype(np.int32)
        return b.append_column("part", pa.array(part, pa.int32()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    # ---- pass 2: per-part max partials -> exclusive max scan (tiny)
    def part_maxes(b: pa.Table) -> pa.Table:
        p = b["part"].combine_chunks().to_numpy(zero_copy_only=False)
        v = b[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq = np.unique(p)
        mx = np.full(len(uniq), WM_SENTINEL, np.int64)
        idx = np.searchsorted(uniq, p)
        np.maximum.at(mx, idx, v)
        return pa.table(
            {
                "part": pa.array(uniq.astype(np.int32), pa.int32()),
                "m": pa.array(mx, pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    from anansi_ray.arrowds import stable_frame

    totals = stable_frame(
        tagged.map_batches(part_maxes, batch_format="pyarrow")
        .groupby("part")
        .aggregate(Max("m", alias_name="m"))
        .to_pandas(),
        {"part": "int64", "m": "int64"},
    ).sort_values("part")
    n_eff = int(boundaries.size) + 1
    pmax = np.full(n_eff, WM_SENTINEL, np.int64)
    if len(totals):
        pmax[totals["part"].to_numpy()] = totals["m"].to_numpy()
    carry = np.full(n_eff, WM_SENTINEL, np.int64)
    if n_eff > 1:
        carry[1:] = np.maximum.accumulate(pmax)[:-1]
    carry_ref = ray.put(carry)

    keep_types = {c: pa.int64() for c in keep_cols}
    try:
        schema = ds.schema(fetch_if_missing=True)
        base = getattr(schema, "base_schema", schema)
        if isinstance(base, pa.Schema):
            for c in keep_cols:
                if c in base.names:
                    keep_types[c] = base.field(c).type
    except Exception:
        pass
    empty = pa.table(
        {
            **{c: pa.array([], keep_types[c]) for c in keep_cols},
            hi_col: pa.array([], pa.int64()),
            "wm_valid": pa.array([], pa.bool_()),
        }
    )

    def finish(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        carr = ray.get(carry_ref)
        part = int(group["part"][0].as_py())
        t = group.take(
            pc.sort_indices(group, sort_keys=[(c, "ascending") for c in order_cols])
        )
        v = t[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        inc = np.maximum.accumulate(v)
        hi = np.empty(len(v), np.int64)
        hi[0] = carr[part]
        hi[1:] = np.maximum(inc[:-1], carr[part])
        valid = hi != WM_SENTINEL
        cols = {c: t[c] for c in keep_cols}
        cols[hi_col] = pa.array(hi, pa.int64())
        cols["wm_valid"] = pa.array(valid, pa.bool_())
        return pa.table(cols)

    return _drop_empty_blocks(
        tagged.groupby("part").map_groups(finish, batch_format="pyarrow").materialize()
    )
