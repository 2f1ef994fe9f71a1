"""Distributed interval (range) join with per-interval aggregation.

For every build-side interval ``(key, lo, hi)`` aggregate the probe-side
points ``(key, t)`` with ``lo <= t < hi`` — "the user's events in the week
after each order".  Like the as-of join (functions/asof.py) this is a
custom operator Ray Data lacks, composed from one co-partitioning
``groupby(hash(key) % n_parts)`` exchange plus a vectorized in-partition
kernel — but the kernel here never materializes the joined pairs at all
(at web scale an interval join's pair blow-up is the hazard): it computes
per-interval COUNT and SUM directly via rank-packing + prefix sums:

1. Dense-factorize the partition's keys (``np.unique``) and rank-compress
   the union of point times and interval boundaries, then pack
   ``(key_index, time_rank)`` into one int64 — packed order ==
   lexicographic (key, t) order, and every key occupies a disjoint range.
2. Sort the points once by packed value; prefix-sum their values.
3. For each interval, two ``np.searchsorted`` calls (side='left' at lo
   and hi) give the point-count and value-sum in O(log n) with NO pair
   expansion: ``n = F(hi) - F(lo)``, ``sum = S(hi) - S(lo)``.
   side='left' makes the window inclusive-exclusive ``[lo, hi)``.

Cost per partition: O((P + B) log (P + B)) regardless of join
selectivity — a 1000x-fan-out hub key costs the same as a sparse one.

Partitioning assumption: a key's points + intervals fit one partition
(hash-bucketed like every keyed stage here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from anansi_ray.arrowds import ts_us

from anansi_ray.arrowds import drop_empty_blocks as _drop_empty_blocks

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _part_of(keys: np.ndarray, n_parts: int) -> pa.Array:
    h = (keys.astype(np.uint64) * _GOLDEN) >> np.uint64(33)
    return pa.array((h % np.uint64(n_parts)).astype(np.int32), pa.int32())


def interval_join_agg(
    points: rd.Dataset,
    intervals: rd.Dataset,
    *,
    key: str,
    point_t: str,
    point_val: str,
    interval_key: str,
    interval_lo: str,
    interval_len_us: int,
    interval_carry: list[str],
    n_parts: int = 32,
) -> rd.Dataset:
    """Per-interval (count, value-sum) over ``[lo, lo + interval_len_us)``.

    Output: ``key``, every ``interval_carry`` column, ``n_points``
    (int64), ``sum_val`` (float64) — one row per interval row, zero-filled
    when no point falls in the window.  Blocks stay partitioned by key
    hash."""
    carry = list(interval_carry)
    _CARRY_TYPES = {
        c: intervals.schema().base_schema.field(c).type for c in carry
    }

    def tag_points(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols: dict = {
            "part": _part_of(keys, n_parts),
            "k": pa.array(keys, pa.int64()),
            "t": ts_us(batch[point_t].combine_chunks()),
            "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "v": batch[point_val].combine_chunks().cast(pa.float64()),
        }
        for c in carry:
            cols[f"c_{c}"] = pa.nulls(n, _CARRY_TYPES[c])
        return pa.table(cols)

    def tag_intervals(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch[interval_key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols: dict = {
            "part": _part_of(keys, n_parts),
            "k": pa.array(keys, pa.int64()),
            "t": ts_us(batch[interval_lo].combine_chunks()),
            "side": pa.array(np.ones(n, np.int8), pa.int8()),
            "v": pa.array(np.zeros(n, np.float64), pa.float64()),
        }
        for c in carry:
            cols[f"c_{c}"] = batch[c]
        return pa.table(cols)

    def _empty_out() -> pa.Table:
        cols: dict = {
            "part": pa.array([], pa.int32()),
            key: pa.array([], pa.int64()),
            "n_points": pa.array([], pa.int64()),
            "sum_val": pa.array([], pa.float64()),
        }
        for c in carry:
            cols[c] = pa.array([], _CARRY_TYPES[c])
        return pa.table(cols)

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return _empty_out()
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        is_iv = side == 1
        lo = t[is_iv]
        hi = lo + np.int64(interval_len_us)
        # dense key index + rank-compressed times over points AND both
        # boundary sets, then pack into one int64 per row
        uk, dall = np.unique(k, return_inverse=True)
        times = np.concatenate([t[~is_iv], lo, hi])
        ut, rall = np.unique(times, return_inverse=True)
        R = np.int64(len(ut) + 1)
        n_pt = int((~is_iv).sum())
        n_iv = int(is_iv.sum())
        d_pt = dall[~is_iv]
        d_iv = dall[is_iv]
        packed_pt = d_pt * R + rall[:n_pt]
        packed_lo = d_iv * R + rall[n_pt : n_pt + n_iv]
        packed_hi = d_iv * R + rall[n_pt + n_iv :]
        order = np.argsort(packed_pt, kind="stable")
        sorted_pt = packed_pt[order]
        S = np.concatenate([[0.0], np.cumsum(v[~is_iv][order])])
        f_lo = np.searchsorted(sorted_pt, packed_lo, side="left")
        f_hi = np.searchsorted(sorted_pt, packed_hi, side="left")
        iv_rows = np.flatnonzero(is_iv)
        out: dict = {
            "part": group["part"].take(pa.array(iv_rows)),
            key: pa.array(k[iv_rows], pa.int64()),
            "n_points": pa.array((f_hi - f_lo).astype(np.int64), pa.int64()),
            "sum_val": pa.array(S[f_hi] - S[f_lo], pa.float64()),
        }
        for c in carry:
            out[c] = group[f"c_{c}"].take(pa.array(iv_rows))
        return pa.table(out)

    unified = (
        points.map_batches(tag_points, batch_format="pyarrow")
        .union(intervals.map_batches(tag_intervals, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )
    return _drop_empty_blocks(unified.materialize())
