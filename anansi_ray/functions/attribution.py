"""Markov-chain removal-effect attribution (Anderl et al. 2014, the
standard data-driven alternative to last-touch): model user journeys as
a first-order Markov chain over touchpoint channels with absorbing
CONVERSION/DROP states, then credit each channel by how much total
conversion probability disappears when that channel is removed
(transitions into it re-route to DROP).

Journey spec (shared by both twins): a user's events sort by
(ts, event_id); the journey is the prefix strictly BEFORE the first
'purchase' event (the purchase is the conversion, not a channel);
transitions are START→first channel, channel→next channel, and
last-channel→CONV (converted) or →DROP (no purchase).  A user whose
first event is a purchase contributes START→CONV.

Scale shape: events co-partition by user hash ONCE; each partition
builds its journeys vectorized (sort + run boundaries, no per-user
Python) and reduces to an (S+2)² integer transition-count matrix —
the only thing that ever reaches the driver.  The absorbing-chain
solve is an S×S linear system on the driver (S = channel count,
catalog-sized).

Determinism: counts are exact integers (summation-order-free), so both
twins hand the identical matrix to the identical solve kernel; outputs
round to 6 decimals.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

CONV_EVENT = "purchase"
ATTR_ROUND = 6

OUT_SPEC = {
    "channel": pa.string(),
    "base_cvr": pa.float64(),
    "cvr_without": pa.float64(),
    "removal_effect": pa.float64(),
    "attribution": pa.float64(),
}


def _empty_out() -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in OUT_SPEC.items()})


def journey_transitions(
    u: np.ndarray, t: np.ndarray, channels: list[str]
) -> np.ndarray:
    """(S+3)×(S+3) integer transition counts from (user, type) rows that
    are ALREADY sorted by (user, ts, event_id).  State order: channels…,
    START, CONV, DROP.  Fully vectorized (run boundaries + masks)."""
    S = len(channels)
    START, CONV, DROP = S, S + 1, S + 2
    M = np.zeros((S + 3, S + 3), np.int64)
    if len(u) == 0:
        return M
    cmap = {c: i for i, c in enumerate(channels)}
    code = np.array([cmap.get(x, -1) for x in t], np.int64)
    is_conv = t == CONV_EVENT
    newu = np.r_[True, u[1:] != u[:-1]]
    uidx = np.cumsum(newu) - 1  # dense user index
    # first-conversion position per user (within-row index); +inf if none
    n_users = uidx[-1] + 1
    rowpos = np.arange(len(u))
    first_conv = np.full(n_users, np.iinfo(np.int64).max, np.int64)
    conv_rows = np.flatnonzero(is_conv)
    if len(conv_rows):
        # rows are user-sorted, so per-user min is a reduceat over runs
        np.minimum.at(first_conv, uidx[conv_rows], rowpos[conv_rows])
    in_prefix = rowpos < first_conv[uidx]
    pre = np.flatnonzero(in_prefix & (code >= 0))
    # consecutive channel-row pairs within the same user
    if len(pre) > 1:
        same = uidx[pre[1:]] == uidx[pre[:-1]]
        np.add.at(M, (code[pre[:-1]][same], code[pre[1:]][same]), 1)
    # START → first channel row per user (users whose prefix is empty
    # but converted: START → CONV below)
    if len(pre):
        firstc = np.r_[True, uidx[pre[1:]] != uidx[pre[:-1]]]
        np.add.at(M, (START, code[pre[firstc]]), 1)
        # last channel row per user → CONV or DROP
        lastc = np.r_[uidx[pre[:-1]] != uidx[pre[1:]], True]
        last_rows = pre[lastc]
        converted = first_conv[uidx[last_rows]] != np.iinfo(np.int64).max
        np.add.at(
            M,
            (code[last_rows], np.where(converted, CONV, DROP)),
            1,
        )
    # users with an empty channel prefix: START → CONV (first event is a
    # purchase) or START → DROP (no channel events at all)
    has_pre = np.zeros(n_users, bool)
    if len(pre):
        has_pre[uidx[pre]] = True
    empty = np.flatnonzero(~has_pre)
    if len(empty):
        conv_empty = first_conv[empty] != np.iinfo(np.int64).max
        M[START, CONV] += int(conv_empty.sum())
        M[START, DROP] += int((~conv_empty).sum())
    return M


def absorption_cvr(M: np.ndarray, removed: int | None = None) -> float:
    """Conversion probability from START of the absorbing chain; with
    ``removed`` set, transitions INTO that channel re-route to DROP and
    its own outgoing row is dropped."""
    S = M.shape[0] - 3
    START, CONV, DROP = S, S + 1, S + 2
    C = M.astype(np.float64).copy()
    if removed is not None:
        C[:, DROP] += C[:, removed]
        C[:, removed] = 0.0
        C[removed, :] = 0.0
    out = C.sum(axis=1)
    transient = [i for i in range(S + 1) if i != removed]
    # row-normalize transient states with outgoing mass
    idx = [i for i in transient if out[i] > 0]
    if START not in idx:
        return 0.0
    k = len(idx)
    pos = {s: j for j, s in enumerate(idx)}
    Q = np.zeros((k, k))
    r = np.zeros(k)
    for s in idx:
        p = C[s] / out[s]
        r[pos[s]] = p[CONV]
        for s2 in idx:
            Q[pos[s], pos[s2]] = p[s2]
    x = np.linalg.solve(np.eye(k) - Q, r)
    return float(x[pos[START]])


def removal_report(M: np.ndarray, channels: list[str]) -> pa.Table:
    base = absorption_cvr(M)
    if base <= 0:
        return _empty_out()
    effects = []
    for i, _ in enumerate(channels):
        without = absorption_cvr(M, removed=i)
        effects.append((base - without) / base)
    tot = sum(max(e, 0.0) for e in effects)
    rows = []
    for i, c in enumerate(channels):
        attr = (max(effects[i], 0.0) / tot) if tot > 0 else 0.0
        rows.append(
            (
                c,
                round(base, ATTR_ROUND),
                round(base * (1 - effects[i]), ATTR_ROUND),
                round(effects[i], ATTR_ROUND),
                round(attr, ATTR_ROUND),
            )
        )
    return pa.table(
        {
            "channel": pa.array([r[0] for r in rows], pa.string()),
            "base_cvr": pa.array([r[1] for r in rows], pa.float64()),
            "cvr_without": pa.array([r[2] for r in rows], pa.float64()),
            "removal_effect": pa.array([r[3] for r in rows], pa.float64()),
            "attribution": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


def markov_attribution_distributed(
    ev: rd.Dataset, channels: list[str], n_parts: int = 32
) -> pa.Table:
    """Co-partition by user hash ONCE; per-partition vectorized journey
    kernel reduces to one (S+3)² integer matrix; driver sums O(parts)
    matrices and runs the tiny absorbing solve."""

    def tag(b: pa.Table) -> pa.Table:
        uu = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((uu % n_parts).astype(np.int32), pa.int32()),
                "user_id": pa.array(uu, pa.int64()),
                "ts": b["ts"],
                "event_id": b["event_id"].cast(pa.int64()),
                "event_type": b["event_type"].cast(pa.string()),
            }
        )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"m": pa.array([], pa.list_(pa.int64()))})
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        gs = g.take(order)
        u = gs["user_id"].to_numpy(zero_copy_only=False)
        t = np.asarray(gs["event_type"].to_pylist(), dtype=object)
        M = journey_transitions(u, t.astype(str), channels)
        return pa.table({"m": pa.array([list(M.ravel())], pa.list_(pa.int64()))})

    parts = (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .to_pandas()
    )
    S = len(channels)
    if len(parts) == 0:
        return _empty_out()
    M = np.sum(
        np.stack([np.asarray(x, np.int64) for x in parts["m"]]), axis=0
    ).reshape(S + 3, S + 3)
    return removal_report(M, channels)


def markov_attribution_local(tbl: pa.Table, channels: list[str]) -> pa.Table:
    """Sequential twin: one sorted slice through the same kernels."""
    if tbl.num_rows == 0:
        return _empty_out()
    order = pc.sort_indices(
        tbl,
        sort_keys=[
            ("user_id", "ascending"),
            ("ts", "ascending"),
            ("event_id", "ascending"),
        ],
    )
    gs = tbl.take(order)
    u = gs["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = np.asarray(gs["event_type"].to_pylist(), dtype=object).astype(str)
    return removal_report(journey_transitions(u, t, channels), channels)
