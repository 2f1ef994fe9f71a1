"""Round-4 seventh-batch operator semantics: broadcast-histogram windowed
rank over skewed partitions, funnel conversion latency — pinned against
independent pandas twins on sf0.001.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from anansi_ray.pipelines.queries import (
    q_funnel_latency,
    q_orders_percentile_rank,
)

SF0001 = "/root/testdata/sf0.001"


def _pdf(name, columns=None):
    return pq.read_table(f"{SF0001}/{name}.parquet", columns=columns).to_pandas()


class TestOrdersPercentileRank:
    def test_vs_pandas_rank(self):
        got = q_orders_percentile_rank(SF0001).to_pandas()
        od = _pdf("orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
        od["cents"] = np.round(od["o_totalprice"].to_numpy() * 100.0).astype("int64")
        od["n_below"] = (
            od.groupby("o_orderpriority")["cents"].rank(method="min").astype("int64")
            - 1
        )
        od["group_n"] = od.groupby("o_orderpriority")["cents"].transform("size")
        want = (
            od[["o_orderkey", "n_below", "group_n"]]
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        want["group_n"] = want["group_n"].astype("int64")
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    def test_rank_bounds(self):
        got = q_orders_percentile_rank(SF0001).to_pandas()
        assert (got["n_below"] >= 0).all()
        assert (got["n_below"] < got["group_n"]).all()


class TestFunnelLatency:
    def test_vs_python_twin(self):
        got = q_funnel_latency(SF0001).to_pandas()
        ev = _pdf("events", ["user_id", "ts", "event_type"])
        ev["t"] = ev["ts"].astype("int64")
        views = ev[ev["event_type"] == "view"].groupby("user_id")["t"].min()
        gaps = []
        buys = ev[ev["event_type"] == "purchase"]
        for uid, t_view in views.items():
            later = buys[(buys["user_id"] == uid) & (buys["t"] > t_view)]
            if len(later):
                gaps.append((later["t"].min() - t_view) // 1_000_000)
        gaps = np.sort(np.array(gaps, dtype=np.int64))
        n = len(gaps)
        assert int(got["n_converted"][0]) == n
        assert int(got["p50_gap_s"][0]) == gaps[int(np.ceil(0.5 * n)) - 1]
        assert int(got["p90_gap_s"][0]) == gaps[int(np.ceil(0.9 * n)) - 1]
