"""Round-4 eighth-batch operator semantics: purchase-cadence median,
mergeable deterministic quantile summary — pinned against independent
pandas twins / the exact quantiles on sf0.001.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from anansi_ray.functions.sketch import (
    Q_SUMMARY_M,
    quantile_summary_estimate,
    quantile_summary_partial,
)
from anansi_ray.pipelines.queries import (
    q_customer_order_cadence,
    q_value_quantile_sketch,
)

SF0001 = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _pdf(name, columns=None):
    return pq.read_table(f"{SF0001}/{name}.parquet", columns=columns).to_pandas()


class TestCustomerOrderCadence:
    def test_vs_pandas_twin(self):
        got = q_customer_order_cadence(SF0001).to_pandas()
        od = _pdf("orders", ["o_custkey", "o_orderdate", "o_orderkey"])
        od["d"] = od["o_orderdate"].astype("int64") // DAY_US
        od = od.sort_values(["o_custkey", "d", "o_orderkey"])
        rows = []
        for cust, grp in od.groupby("o_custkey"):
            d = grp["d"].to_numpy()
            if len(d) < 2:
                continue
            gaps = np.sort(np.diff(d))
            rows.append((cust, len(gaps), int(gaps[(len(gaps) - 1) // 2])))
        want = pd.DataFrame(
            rows, columns=["o_custkey", "n_gaps", "median_gap_days"]
        ).sort_values("o_custkey")
        want["n_gaps"] = want["n_gaps"].astype("int64")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_single_order_customers_absent(self):
        got = q_customer_order_cadence(SF0001).to_pandas()
        od = _pdf("orders", ["o_custkey"])
        multi = od["o_custkey"].value_counts()
        multi = set(multi[multi >= 2].index)
        assert set(got["o_custkey"]) == multi


class TestQuantileSummary:
    def test_rank_error_bound(self):
        # the summary's estimated quantile must sit within N/(2m) * B ranks
        # of the true order statistic, per the MRL bound (B = #batches;
        # the engine run below uses one partial per Ray block)
        ev = _pdf("events", ["value"])
        v = np.sort(ev["value"].to_numpy())
        n = len(v)
        got = q_value_quantile_sketch(SF0001).to_pandas()
        # generous envelope: the test corpus runs through a handful of
        # blocks, each contributing <= n_b/(2m) rank error
        max_rank_err = int(np.ceil(n / (2 * Q_SUMMARY_M))) * 8 + 2
        for q, col in [(0.5, "p50_approx"), (0.9, "p90_approx"), (0.99, "p99_approx")]:
            est = float(got[col][0])
            target = int(np.ceil(q * n)) - 1
            lo = v[max(0, target - max_rank_err)]
            hi = v[min(n - 1, target + max_rank_err)]
            assert lo <= est <= hi, (q, est, lo, hi)

    def test_partial_state_bounded(self):
        ev = pq.read_table(f"{SF0001}/events.parquet", columns=["value"])
        out = quantile_summary_partial(ev, "value")
        assert out.num_rows <= Q_SUMMARY_M
        # total weight conserves the row count
        assert abs(sum(out["weight"].to_pylist()) - ev.num_rows) < 1e-6

    def test_exact_when_small(self):
        t = pa.table({"value": pa.array([5.0, 1.0, 3.0, 2.0, 4.0])})
        s = quantile_summary_partial(t, "value").to_pandas()
        est = quantile_summary_estimate(s, [0.5])
        assert est[0] == 3.0
