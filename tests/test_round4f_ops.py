"""Round-4 sixth-batch operator semantics: columnar profiling, SCD-style
run compaction, aggregate-then-window day-over-day deltas — each pinned
against an independent pandas twin on sf0.001.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from anansi_ray.pipelines.queries import (
    q_daily_revenue_delta,
    q_events_profile,
    q_user_state_intervals,
)

SF0001 = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _pdf(name, columns=None):
    return pq.read_table(f"{SF0001}/{name}.parquet", columns=columns).to_pandas()


class TestEventsProfile:
    def test_vs_pandas_nunique(self):
        got = q_events_profile(SF0001).to_pandas().set_index("col")
        ev = _pdf("events")
        for col in ("event_id", "ts", "user_id", "event_type", "value", "props"):
            assert got.loc[col, "n"] == len(ev)
            assert got.loc[col, "n_null"] == int(ev[col].isna().sum())
            assert got.loc[col, "n_distinct"] == ev[col].nunique(), col

    def test_key_column_is_unique(self):
        got = q_events_profile(SF0001).to_pandas().set_index("col")
        assert got.loc["event_id", "n_distinct"] == got.loc["event_id", "n"]


class TestUserStateIntervals:
    def test_vs_pandas_runs(self):
        got = q_user_state_intervals(SF0001).to_pandas()
        ev = _pdf("events", ["event_id", "ts", "user_id", "event_type"])
        ev["t"] = ev["ts"].astype("int64")
        ev = ev.sort_values(["user_id", "t", "event_id"])
        new_run = (ev["user_id"].ne(ev["user_id"].shift())) | (
            ev["event_type"].ne(ev["event_type"].shift())
        )
        ev["run"] = new_run.cumsum()
        want = (
            ev.groupby("run")
            .agg(
                user_id=("user_id", "first"),
                event_type=("event_type", "first"),
                start_us=("t", "min"),
                end_us=("t", "max"),
                n_events=("t", "size"),
            )
            .reset_index(drop=True)
            .sort_values(["user_id", "start_us", "end_us", "event_type"])
        )
        want["n_events"] = want["n_events"].astype("int64")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_runs_partition_events(self):
        got = q_user_state_intervals(SF0001).to_pandas()
        ev = _pdf("events", ["user_id"])
        assert int(got["n_events"].sum()) == len(ev)
        assert (got["start_us"] <= got["end_us"]).all()


class TestDailyRevenueDelta:
    def test_vs_pandas_diff(self):
        got = q_daily_revenue_delta(SF0001).to_pandas()
        od = _pdf("orders", ["o_orderdate", "o_totalprice"])
        od["dayno"] = od["o_orderdate"].astype("int64") // DAY_US
        od["cents"] = np.round(od["o_totalprice"].to_numpy() * 100.0).astype("int64")
        want = (
            od.groupby("dayno")["cents"].sum().rename("rev_cents").reset_index()
        ).sort_values("dayno")
        want["delta_cents"] = want["rev_cents"].diff()
        assert list(got["dayno"]) == list(want["dayno"])
        assert list(got["rev_cents"]) == list(want["rev_cents"])
        assert pd.isna(got["delta_cents"][0])
        np.testing.assert_array_equal(
            got["delta_cents"].to_numpy()[1:],
            want["delta_cents"].to_numpy()[1:].astype("int64"),
        )
