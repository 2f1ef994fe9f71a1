"""Stream-shaped operators over the ``events`` table (SURVEY.md §2.12).

Ray Data has no event-time watermarks; the reference's only streaming
semantics are TTL windows + per-host rate gates.  These operators show the
general pattern for stream-shaped workloads on a batch engine: treat the
input as an ordered, partitioned log — partition by key, sort by ts within
the partition, window inside ``map_groups``.

Ordering assumption: within one ``user_id`` group, rows are processed in
(ts, event_id) order — pinned explicitly so results are deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from anansi_ray.arrowds import ts_us

HOUR_US = 3_600_000_000


def _window_partial(
    users: np.ndarray, wins: np.ndarray, vals: np.ndarray
) -> pa.Table:
    """(user, window) partial aggregate via the run-boundary kernel: one
    lexsort + reduceat — the session-window pattern, no pandas round-trip."""
    order = np.lexsort((wins, users))
    u, w, v = users[order], wins[order], vals[order]
    first = np.ones(len(u), dtype=bool)
    if len(u):
        first[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
    starts = np.flatnonzero(first)
    counts = np.diff(np.append(starts, len(u)))
    sums = np.add.reduceat(v, starts) if len(u) else np.empty(0, v.dtype)
    return pa.table(
        {
            "user_id": pa.array(u[starts], pa.int64()),
            "window_us": pa.array(w[starts], pa.int64()),
            "n_events": pa.array(counts, pa.int64()),
            "sum_value": pa.array(sums, pa.float64()),
        }
    )


def tumbling_window(ds: rd.Dataset, window_us: int = HOUR_US) -> rd.Dataset:
    """Tumbling count/sum per (user_id, window).  The window column is a
    cheap map; the only shuffle is the groupby on (user_id, window_start) —
    pre-aggregated per batch first (combiner) so the exchange carries one
    row per key per batch, not raw events."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = ts_us(batch["ts"]).to_numpy(zero_copy_only=False)
        return _window_partial(
            batch["user_id"].to_numpy(zero_copy_only=False),
            (ts // window_us) * window_us,
            batch["value"].to_numpy(zero_copy_only=False),
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    merged = partials.groupby(["user_id", "window_us"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "window_us": batch["window_us"],
                "n_events": batch["n_events"].cast(pa.int64()),
                "sum_value": pa.array(
                    np.round(
                        batch["sum_value"].to_numpy(zero_copy_only=False), 4
                    ),
                    pa.float64(),
                ),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow")


def sliding_window(
    ds: rd.Dataset, window_us: int = HOUR_US, hop_us: int = HOUR_US // 2
) -> rd.Dataset:
    """Sliding (hopping) windows: each event lands in window_us/hop_us
    overlapping windows; explode per batch, then the same pre-aggregated
    groupby as the tumbling case."""
    k = window_us // hop_us

    def explode(batch: pa.Table) -> pa.Table:
        ts = ts_us(batch["ts"]).to_numpy(zero_copy_only=False)
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        vals = batch["value"].to_numpy(zero_copy_only=False)
        base = (ts // hop_us) * hop_us
        # k shifted copies (one per overlapping window), filtered to t>=0,
        # then the shared run-boundary partial — no pandas round-trip
        u_parts, w_parts, v_parts = [], [], []
        for i in range(k):
            start = base - i * hop_us
            keep = start >= 0
            u_parts.append(users[keep])
            w_parts.append(start[keep])
            v_parts.append(vals[keep])
        return _window_partial(
            np.concatenate(u_parts), np.concatenate(w_parts), np.concatenate(v_parts)
        )

    from ray.data.aggregate import Sum

    merged = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["user_id", "window_us"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "window_us": batch["window_us"],
                "n_events": batch["n_events"].cast(pa.int64()),
                "sum_value": pa.array(
                    np.round(batch["sum_value"].to_numpy(zero_copy_only=False), 4),
                    pa.float64(),
                ),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow")


_EMPTY_SESSIONS = pa.table(
    {
        "user_id": pa.array([], pa.int64()),
        "session_id": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64()),
        "start_us": pa.array([], pa.int64()),
        "end_us": pa.array([], pa.int64()),
        "sum_value": pa.array([], pa.float64()),
    }
)


def session_windows(ds: rd.Dataset, gap_us: int = HOUR_US) -> rd.Dataset:
    """Gap-based session windows per user: a new session starts when the gap
    since the previous event exceeds ``gap_us``.

    Arrow-native partition kernel (no pandas, no per-user micro-groups):
    rows exchange on ``part = mix64(user_id) % n_parts``, each partition
    sorts once by (user_id, ts, event_id) and derives every user's session
    boundaries in one vectorized pass (run-change masks + ``reduceat``) —
    the same shape as the dedup kernels.  A user's whole history lands in
    one partition (required for correctness), but a partition holds many
    users, so task memory is partition-sized, not user-sized."""
    import pyarrow.compute as pc

    from anansi_ray.functions.dedup import _np, _part_np

    n_parts = 64

    def tag(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "part": _part_np(u.to_numpy(zero_copy_only=False), n_parts),
                "user_id": u,
                "ts": ts_us(batch["ts"].combine_chunks()),
                "event_id": batch["event_id"].combine_chunks().cast(pa.int64()),
                "value": batch["value"].combine_chunks().cast(pa.float64()),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _EMPTY_SESSIONS
        t = group.take(
            pc.sort_indices(
                group,
                sort_keys=[
                    ("user_id", "ascending"),
                    ("ts", "ascending"),
                    ("event_id", "ascending"),
                ],
            )
        )
        u = _np(t["user_id"])
        ts = _np(t["ts"])
        val = _np(t["value"])
        new_user = np.r_[True, u[1:] != u[:-1]]
        new_sess = new_user | np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        starts = np.flatnonzero(new_sess)
        ends = np.r_[starts[1:], len(u)]
        # session_id = 1-based rank of the session within its user
        sess_new_user = new_user[starts]
        seq = np.arange(len(starts), dtype=np.int64)
        user_first = seq[sess_new_user]
        sid = seq - user_first[np.cumsum(sess_new_user) - 1] + 1
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "session_id": pa.array(sid, pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[ends - 1], pa.int64()),
                "sum_value": pa.array(
                    np.round(np.add.reduceat(val, starts), 4), pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


_EMPTY_HEADS = pa.table(
    {
        "user_id": pa.array([], pa.int64()),
        "event_id": pa.array([], pa.int64()),
        "ts_us": pa.array([], pa.int64()),
    }
)


def burst_heads(ds: rd.Dataset, gap_us: int = HOUR_US) -> rd.Dataset:
    """Event throttling / burst suppression (streaming dedup): keep only
    the FIRST event of every burst per user, where a burst is a chain of
    events each within ``gap_us`` of its predecessor — i.e. the head row
    of every gap-based session.  The dedup a rate-limited notifier or a
    near-duplicate event stream needs.

    Same partition-kernel shape as :func:`session_windows` (one exchange
    on user hash, one vectorized sort + run-boundary pass per partition);
    only the projection differs — it emits the rows at session starts."""
    import pyarrow.compute as pc

    from anansi_ray.functions.dedup import _np, _part_np

    n_parts = 64

    def tag(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "part": _part_np(u.to_numpy(zero_copy_only=False), n_parts),
                "user_id": u,
                "ts": ts_us(batch["ts"].combine_chunks()),
                "event_id": batch["event_id"].combine_chunks().cast(pa.int64()),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _EMPTY_HEADS
        t = group.take(
            pc.sort_indices(
                group,
                sort_keys=[
                    ("user_id", "ascending"),
                    ("ts", "ascending"),
                    ("event_id", "ascending"),
                ],
            )
        )
        u = _np(t["user_id"])
        ts = _np(t["ts"])
        eid = _np(t["event_id"])
        new_user = np.r_[True, u[1:] != u[:-1]]
        head = new_user | np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        return pa.table(
            {
                "user_id": pa.array(u[head], pa.int64()),
                "event_id": pa.array(eid[head], pa.int64()),
                "ts_us": pa.array(ts[head], pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def lag_lead_window(ds: rd.Dataset) -> rd.Dataset:
    """Per-key ordered row window: row_number, lag(value), lead(value) and
    delta over (PARTITION BY user_id ORDER BY ts, event_id) — the
    lag/lead/rank family of SQL window functions as a distributed operator.

    Same partition-kernel shape as session_windows: one exchange on
    ``part = mix64(user_id) % n_parts`` co-locates each user's history,
    every partition sorts once and derives all window columns with run-
    boundary masks + shifts (no per-user micro-groups, no pandas).  Only
    exact ops (copies, integer ranks, one float subtraction) so a SQL twin
    reproduces values bit-for-bit."""
    import pyarrow.compute as pc

    from anansi_ray.functions.dedup import _np, _part_np

    n_parts = 64

    def tag(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "part": _part_np(u.to_numpy(zero_copy_only=False), n_parts),
                "user_id": u,
                "ts": ts_us(batch["ts"].combine_chunks()),
                "event_id": batch["event_id"].combine_chunks().cast(pa.int64()),
                "value": batch["value"].combine_chunks().cast(pa.float64()),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "rn": pa.array([], pa.int64()),
                    "prev_value": pa.array([], pa.float64()),
                    "next_value": pa.array([], pa.float64()),
                    "delta": pa.array([], pa.float64()),
                }
            )
        t = group.take(
            pc.sort_indices(
                group,
                sort_keys=[
                    ("user_id", "ascending"),
                    ("ts", "ascending"),
                    ("event_id", "ascending"),
                ],
            )
        )
        u = _np(t["user_id"])
        val = _np(t["value"])
        new_user = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(new_user)
        run_id = np.cumsum(new_user) - 1
        rn = np.arange(len(u), dtype=np.int64) - starts[run_id] + 1
        prev = np.r_[np.nan, val[:-1]]
        prev[new_user] = np.nan
        nxt = np.r_[val[1:], np.nan]
        nxt[np.r_[new_user[1:], True]] = np.nan
        delta = np.round(val - prev, 6)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "rn": pa.array(rn, pa.int64()),
                "prev_value": pa.array(prev, pa.float64(), from_pandas=True),
                "next_value": pa.array(nxt, pa.float64(), from_pandas=True),
                "delta": pa.array(delta, pa.float64(), from_pandas=True),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def interval_union_sweep(
    u: np.ndarray, s: np.ndarray, e: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Partition kernel for interval union/coverage: given per-key interval
    (start, end) pairs — variable lengths allowed — return, per key, the
    number of merged islands and the total covered span.

    Vectorized sweep: lexsort by (key, start), running max of end with a
    per-key reset via band-offset accumulation (band product bounded by
    keys-in-partition × value span; raise the partition count to keep it
    inside int64).  An island starts where start > previous running end.
    Used by pipelines.queries.q_user_active_time; kept importable so the
    variable-length path is unit-testable without a Ray session."""
    order = np.lexsort((s, u))
    u, s, e = u[order], s[order], e[order]
    ustart = np.r_[True, u[1:] != u[:-1]]
    uid = np.cumsum(ustart) - 1
    base = min(int(s.min()), int(e.min()))
    e0 = e - base
    band = uid * (np.int64(e0.max()) + 1)
    run_end = np.maximum.accumulate(e0 + band) - band + base
    prev_end = np.r_[np.int64(0), run_end[:-1]]
    new_isl = ustart | (s > prev_end)
    isl = np.cumsum(new_isl) - 1
    n_isl = int(isl[-1]) + 1
    isl_start = s[new_isl]
    isl_end = np.zeros(n_isl, np.int64)
    np.maximum.at(isl_end, isl, e)
    cov = isl_end - isl_start
    uu = u[ustart]
    isl_uid = uid[new_isl]
    n_int = np.bincount(isl_uid, minlength=len(uu)).astype(np.int64)
    covered = np.zeros(len(uu), np.int64)
    np.add.at(covered, isl_uid, cov)
    return uu, n_int, covered
