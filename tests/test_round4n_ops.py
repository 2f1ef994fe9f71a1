"""Round-4 fourteenth-batch operator semantics: deterministic arg-extremes
and cumulative adoption curve — pinned against independent pandas twins on
sf0.001.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from anansi_ray.pipelines.queries import (
    q_adoption_curve,
    q_priority_price_extremes,
)

SF0001 = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _pdf(name, columns=None):
    return pq.read_table(f"{SF0001}/{name}.parquet", columns=columns).to_pandas()


class TestPriorityPriceExtremes:
    def test_vs_pandas_twin(self):
        got = q_priority_price_extremes(SF0001).to_pandas()
        od = _pdf("orders", ["o_orderpriority", "o_totalprice", "o_orderkey"])
        od["cents"] = np.round(od["o_totalprice"].to_numpy() * 100.0).astype("int64")
        rows = []
        for pri, grp in od.groupby("o_orderpriority"):
            mn = grp["cents"].min()
            mx = grp["cents"].max()
            kmin = int(grp[grp["cents"] == mn]["o_orderkey"].min())
            kmax = int(grp[grp["cents"] == mx]["o_orderkey"].min())
            rows.append((pri, int(mn), kmin, int(mx), kmax))
        want = pd.DataFrame(
            rows,
            columns=[
                "o_orderpriority",
                "min_cents",
                "min_orderkey",
                "max_cents",
                "max_orderkey",
            ],
        ).sort_values("o_orderpriority")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


class TestAdoptionCurve:
    def test_vs_pandas_twin(self):
        got = q_adoption_curve(SF0001).to_pandas()
        ev = _pdf("events", ["user_id", "ts"])
        ev["dayno"] = ev["ts"].astype("int64") // DAY_US
        f = ev.groupby("user_id")["dayno"].min()
        days, cnt = np.unique(f.to_numpy(), return_counts=True)
        assert list(got["dayno"]) == list(days)
        assert list(got["n_new"]) == list(cnt)
        assert list(got["n_cum"]) == list(cnt.cumsum())

    def test_cum_ends_at_user_count(self):
        got = q_adoption_curve(SF0001).to_pandas()
        ev = _pdf("events", ["user_id"])
        assert int(got["n_cum"].iloc[-1]) == ev["user_id"].nunique()
