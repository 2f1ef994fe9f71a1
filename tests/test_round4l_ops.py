"""Round-4 twelfth-batch operator semantics: integer-exact z-score
anomalies, same-day repeat-order audit, cross-table key-coverage audit —
pinned against independent pandas twins on sf0.001.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from anansi_ray.pipelines.queries import (
    q_daily_anomalies,
    q_duplicate_orders_audit,
    q_user_coverage_audit,
)

SF0001 = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _pdf(name, columns=None):
    return pq.read_table(f"{SF0001}/{name}.parquet", columns=columns).to_pandas()


class TestDailyAnomalies:
    def test_vs_python_twin(self):
        got = q_daily_anomalies(SF0001).to_pandas()
        ev = _pdf("events", ["event_type", "ts"])
        ev["dayno"] = ev["ts"].astype("int64") // DAY_US
        rows = []
        for et, grp in ev.groupby("event_type"):
            c = grp.groupby("dayno").size()
            n = len(c)
            S = int(c.sum())
            S2 = int((c * c).sum())
            rhs = 4 * (n * S2 - S * S)
            for day, cnt in c.items():
                if (n * int(cnt) - S) ** 2 > rhs:
                    rows.append((et, int(day), int(cnt)))
        rows.sort()
        want = pd.DataFrame(rows, columns=["event_type", "dayno", "n"])
        if len(want) == 0:
            assert len(got) == 0
        else:
            pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    def test_integer_test_matches_float_zscore(self):
        got = q_daily_anomalies(SF0001).to_pandas()
        ev = _pdf("events", ["event_type", "ts"])
        ev["dayno"] = ev["ts"].astype("int64") // DAY_US
        flagged = set(zip(got["event_type"], got["dayno"]))
        for et, grp in ev.groupby("event_type"):
            c = grp.groupby("dayno").size().astype(float)
            mu, sig = c.mean(), c.std(ddof=0)
            for day, cnt in c.items():
                z_hit = sig > 0 and abs(cnt - mu) > 2 * sig
                assert z_hit == ((et, int(day)) in flagged), (et, day)


class TestDuplicateOrdersAudit:
    def test_vs_pandas_twin(self):
        got = q_duplicate_orders_audit(SF0001).to_pandas()
        od = _pdf("orders", ["o_custkey", "o_orderdate"])
        od["dayno"] = od["o_orderdate"].astype("int64") // DAY_US
        g = od.groupby(["o_custkey", "dayno"]).size()
        want = (
            g[g > 1]
            .reset_index(name="n")
            .sort_values(["o_custkey", "dayno"])
            .reset_index(drop=True)
        )
        want["n"] = want["n"].astype("int64")
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


class TestUserCoverageAudit:
    def test_vs_set_twin(self):
        got = q_user_coverage_audit(SF0001).to_pandas()
        e = set(_pdf("events", ["user_id"])["user_id"])
        c = set(_pdf("customer", ["c_custkey"])["c_custkey"])
        assert int(got["n_both"][0]) == len(e & c)
        assert int(got["n_events_only"][0]) == len(e - c)
        assert int(got["n_customers_only"][0]) == len(c - e)
