"""Round-4 tenth-batch operator semantics: k-anonymity audit and
group-mean imputation — pinned against independent pandas twins on
sf0.001.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from anansi_ray.pipelines.queries import q_impute_missing, q_k_anonymity

SF0001 = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _pdf(name, columns=None):
    return pq.read_table(f"{SF0001}/{name}.parquet", columns=columns).to_pandas()


class TestKAnonymity:
    def test_vs_pandas_twin(self):
        got = q_k_anonymity(SF0001).to_pandas()
        od = _pdf("orders", ["o_orderstatus", "o_orderpriority", "o_orderdate"])
        od["mo"] = od["o_orderdate"].astype("int64") // DAY_US // 30
        g = od.groupby(["o_orderstatus", "o_orderpriority", "mo"]).size()
        assert int(got["n_groups"][0]) == len(g)
        assert int(got["n_small_groups"][0]) == int((g < 10).sum())
        assert int(got["n_rows_at_risk"][0]) == int(g[g < 10].sum())

    def test_conservation(self):
        got = q_k_anonymity(SF0001).to_pandas()
        assert int(got["n_small_groups"][0]) <= int(got["n_groups"][0])
        assert int(got["n_rows_at_risk"][0]) < 10 * int(got["n_small_groups"][0]) + 1


class TestImputeMissing:
    def test_vs_pandas_twin(self):
        got = q_impute_missing(SF0001).to_pandas()
        ev = _pdf("events", ["event_id", "event_type", "value"])
        ev["vfp"] = np.floor(ev["value"].to_numpy() * 10000.0).astype("int64")
        keep = ev[ev["event_id"] % 13 != 0]
        means = (keep.groupby("event_type")["vfp"].sum() // keep.groupby("event_type")["vfp"].size())
        miss = ev[ev["event_id"] % 13 == 0].sort_values("event_id")
        want = pd.DataFrame(
            {
                "event_id": miss["event_id"].to_numpy(),
                "event_type": miss["event_type"].to_numpy(),
                "value_fp": means.reindex(miss["event_type"]).to_numpy(np.int64),
            }
        )
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    def test_only_missing_rows_output(self):
        got = q_impute_missing(SF0001).to_pandas()
        assert (got["event_id"] % 13 == 0).all()
        ev = _pdf("events", ["event_id"])
        assert len(got) == int((ev["event_id"] % 13 == 0).sum())
