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
import pandas as pd
import pyarrow as pa
import ray.data as rd

HOUR_US = 3_600_000_000


def tumbling_window(ds: rd.Dataset, window_us: int = HOUR_US) -> rd.Dataset:
    """Tumbling count/sum per (user_id, window).  The window column is a
    cheap map; the only shuffle is the groupby on (user_id, window_start) —
    pre-aggregated per batch first (combiner) so the exchange carries one
    row per key per batch, not raw events."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // window_us) * window_us
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "window_us": win,
                "value": batch["value"].to_numpy(zero_copy_only=False),
            }
        )
        agg = df.groupby(["user_id", "window_us"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

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
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        vals = batch["value"].to_numpy(zero_copy_only=False)
        base = (ts // hop_us) * hop_us
        frames = []
        for i in range(k):
            start = base - i * hop_us
            keep = start >= 0
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": users[keep],
                        "window_us": start[keep],
                        "value": vals[keep],
                    }
                )
            )
        df = pd.concat(frames, ignore_index=True)
        agg = df.groupby(["user_id", "window_us"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

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


def session_windows(ds: rd.Dataset, gap_us: int = HOUR_US) -> rd.Dataset:
    """Gap-based session windows per user: a new session starts when the gap
    since the previous event exceeds ``gap_us``.  groupby(user_id) +
    windowing over the (ts, event_id)-sorted group."""

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64")
        new_session = (ts - ts.shift(1)).fillna(gap_us + 1) > gap_us
        sid = new_session.cumsum()
        out = g.assign(session_id=sid).groupby("session_id").agg(
            n_events=("event_id", "size"),
            start_us=("ts", "min"),
            end_us=("ts", "max"),
            sum_value=("value", "sum"),
        )
        out = out.reset_index()
        out["user_id"] = g["user_id"].iloc[0]
        out["sum_value"] = out["sum_value"].round(4)
        out["start_us"] = out["start_us"].astype("int64")
        out["end_us"] = out["end_us"].astype("int64")
        return out[["user_id", "session_id", "n_events", "start_us", "end_us", "sum_value"]]

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
