"""Distributed as-of (backward) join.

For every probe row ``(key, t)`` find the build row with the same ``key``
and the greatest ``build_t <= t`` — "the user's most recent order at or
before the event".  Ray Data has no asof-join operator, so this composes
one from the primitives the engine does have (the custom-operator recipe:
map_batches tagging + one co-partitioning exchange + a vectorized
in-partition kernel):

1. Both sides are projected onto a unified narrow schema
   ``(key, t, side, tb, payload…, carry…)`` — ``side`` 0 = build,
   1 = probe; ``tb`` is the build-side tie-break value (0 on probe rows).
2. One ``groupby(part)`` exchange on ``part = hash(key) % n_parts``
   co-locates each key's build AND probe rows (the only shuffle; both
   inputs move exactly once, payload columns are pruned to what the
   caller asked to carry through).
3. Inside each partition the kernel is fully vectorized: one
   ``sort_indices`` by ``(key, t, side, tb)`` followed by a numpy
   forward-fill — ``cummax`` over build-row positions, reset at key-run
   boundaries via a segment-start comparison.  No per-row Python, no
   per-key loop.

Tie semantics (pinned, so a SQL oracle can reproduce the result
deterministically): probe at ``t`` sees build rows with ``build_t == t``
(inclusive asof); among build rows sharing ``(key, build_t)`` the one
with the greatest ``tb`` wins (build rows sort ascending by ``tb`` and
the cummax keeps the last).

Partitioning assumption: a key's rows fit one partition (same contract
as every hash-bucketed stage here); skewed KEYS are fine — the kernel is
O(n log n) in partition size and carries no per-key state.

Scale shape: the exchange is the only all-to-all; output blocks stay
partitioned by key hash, so callers that aggregate per key afterwards
can do so with ``map_batches(..., batch_size=None)`` on whole blocks —
no second shuffle.
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


def asof_join(
    probe: rd.Dataset,
    build: rd.Dataset,
    *,
    key: str,
    probe_on: str,
    build_on: str,
    probe_carry: list[str],
    build_payload: list[str],
    build_tiebreak: str,
    build_key: str | None = None,
    n_parts: int = 32,
) -> rd.Dataset:
    """Backward as-of join; returns one row per probe row.

    Output columns: ``key``, every ``probe_carry`` column, ``matched``
    (bool), every ``build_payload`` column (zero/empty when unmatched —
    sentinel-free ``matched`` carries the null information so downstream
    aggregation never meets nulls), plus the internal ``part`` column
    (kept so callers can finish per-key work block-locally).
    """
    payload = list(build_payload)
    carry = list(probe_carry)
    bkey = build_key or key

    def tag_build(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch[bkey].to_numpy(zero_copy_only=False).astype(np.int64)
        cols: dict = {
            "part": _part_of(keys, n_parts),
            "k": pa.array(keys, pa.int64()),
            "t": ts_us(batch[build_on].combine_chunks()),
            "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "tb": ts_us(batch[build_tiebreak].combine_chunks()),
        }
        for c in payload:
            cols[f"p_{c}"] = batch[c]
        for c in carry:
            cols[f"c_{c}"] = pa.nulls(n, _CARRY_TYPES[c])
        return pa.table(cols)

    def tag_probe(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols: dict = {
            "part": _part_of(keys, n_parts),
            "k": pa.array(keys, pa.int64()),
            "t": ts_us(batch[probe_on].combine_chunks()),
            "side": pa.array(np.ones(n, np.int8), pa.int8()),
            "tb": pa.array(np.zeros(n, np.int64), pa.int64()),
        }
        for c in payload:
            cols[f"p_{c}"] = pa.nulls(n, _PAYLOAD_TYPES[c])
        for c in carry:
            cols[f"c_{c}"] = batch[c]
        return pa.table(cols)

    # the two tag fns close over the concrete Arrow types so the union's
    # schemas line up exactly (null columns must carry the real type)
    _PAYLOAD_TYPES = {c: build.schema().base_schema.field(c).type for c in payload}
    _CARRY_TYPES = {c: probe.schema().base_schema.field(c).type for c in carry}

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return _empty_out()
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("k", "ascending"),
                ("t", "ascending"),
                ("side", "ascending"),
                ("tb", "ascending"),
            ],
        )
        g = group.take(order)
        n = g.num_rows
        k = g["k"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        idx = np.arange(n, dtype=np.int64)
        # forward-fill the latest build-row position, reset per key run
        cm = np.maximum.accumulate(np.where(side == 0, idx, -1))
        key_change = np.empty(n, dtype=bool)
        key_change[0] = True
        np.not_equal(k[1:], k[:-1], out=key_change[1:])
        seg_start = idx[key_change][np.cumsum(key_change) - 1]
        probe_rows = side == 1
        valid = probe_rows & (cm >= seg_start)
        # gather build payload for probe rows (0-index for unmatched,
        # zeroed below through the matched mask)
        src = np.where(valid, cm, 0)[probe_rows]
        matched = valid[probe_rows]
        m_arr = pa.array(matched)
        out: dict = {
            "part": g["part"].take(pa.array(idx[probe_rows])),
            key: pa.array(k[probe_rows], pa.int64()),
            "matched": m_arr,
        }
        for c in carry:
            out[c] = g[f"c_{c}"].take(pa.array(idx[probe_rows]))
        take_src = pa.array(src)
        for c in payload:
            vals = g[f"p_{c}"].take(take_src)
            # zero out unmatched rows so downstream sums need no null path
            out[c] = pc.if_else(m_arr, vals, _zero_scalar(vals.type))
        return pa.table(out)

    def _zero_scalar(t: pa.DataType):
        if pa.types.is_floating(t):
            return pa.scalar(0.0, t)
        if pa.types.is_integer(t):
            return pa.scalar(0, t)
        if pa.types.is_string(t):
            return pa.scalar("", t)
        return pa.scalar(None, t)

    def _empty_out() -> pa.Table:
        cols: dict = {
            "part": pa.array([], pa.int32()),
            key: pa.array([], pa.int64()),
            "matched": pa.array([], pa.bool_()),
        }
        for c in carry:
            cols[c] = pa.array([], _CARRY_TYPES[c])
        for c in payload:
            cols[c] = pa.array([], _PAYLOAD_TYPES[c])
        return pa.table(cols)

    unified = (
        build.map_batches(tag_build, batch_format="pyarrow")
        .union(probe.map_batches(tag_probe, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )
    return _drop_empty_blocks(unified.materialize())
