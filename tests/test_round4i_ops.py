"""Round-4 ninth-batch operator semantics: threshold-quintile RFM scoring
and Pareto revenue concentration — pinned against independent pandas twins
on sf0.001.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from anansi_ray.pipelines.queries import q_customer_rfm, q_revenue_pareto

SF0001 = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _base():
    od = pq.read_table(
        f"{SF0001}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).to_pandas()
    od["dayno"] = od["o_orderdate"].astype("int64") // DAY_US
    od["cents"] = np.round(od["o_totalprice"].to_numpy() * 100.0).astype("int64")
    b = od.groupby("o_custkey").agg(
        last_day=("dayno", "max"), freq=("dayno", "size"), monetary=("cents", "sum")
    )
    b["recency"] = int(b["last_day"].max()) - b["last_day"]
    return b.reset_index()


def _cut(v, q):
    vals, cnt = np.unique(v, return_counts=True)
    cum = cnt.cumsum()
    return int(vals[np.searchsorted(cum, int(np.ceil(q * cum[-1])), side="left")])


class TestCustomerRFM:
    def test_vs_python_twin(self):
        got = q_customer_rfm(SF0001).to_pandas()
        b = _base().sort_values("o_custkey")
        for metric, col, invert in [
            ("recency", "r_score", True),
            ("freq", "f_score", False),
            ("monetary", "m_score", False),
        ]:
            v = b[metric].to_numpy()
            cuts = [_cut(v, q) for q in (0.2, 0.4, 0.6, 0.8)]
            s = 1 + sum((v > c).astype("int64") for c in cuts)
            if invert:
                s = 6 - s
            np.testing.assert_array_equal(got[col].to_numpy(), s, err_msg=metric)

    def test_scores_in_range_and_ties_equal(self):
        got = q_customer_rfm(SF0001).to_pandas()
        for col in ("r_score", "f_score", "m_score"):
            assert got[col].between(1, 5).all()
        b = _base().sort_values("o_custkey").reset_index(drop=True)
        merged = got.reset_index(drop=True).join(b[["freq"]])
        # equal frequency must imply equal f_score (permutation invariance)
        assert (merged.groupby("freq")["f_score"].nunique() == 1).all()


class TestRevenuePareto:
    def test_vs_python_twin(self):
        got = q_revenue_pareto(SF0001).to_pandas()
        b = _base()
        rev = np.sort(b["monetary"].to_numpy())[::-1]
        cum = rev.cumsum()
        tot = int(cum[-1])
        target = int(np.ceil(0.8 * tot))
        n_top = int(np.searchsorted(cum, target, side="left")) + 1
        assert int(got["n_customers"][0]) == len(rev)
        assert int(got["n_top80"][0]) == n_top
        assert int(got["total_rev_cents"][0]) == tot

    def test_minimality(self):
        got = q_revenue_pareto(SF0001).to_pandas()
        b = _base()
        rev = np.sort(b["monetary"].to_numpy())[::-1]
        tot = rev.sum()
        k = int(got["n_top80"][0])
        assert rev[:k].sum() >= np.ceil(0.8 * tot)
        assert rev[: k - 1].sum() < np.ceil(0.8 * tot)
