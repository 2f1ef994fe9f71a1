"""Salted skew-join: the hot-key replication path must produce identical
results to a plain merge, and the salting must actually engage on skew."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _skewed_tables(tmp_path):
    """1 hub orderkey holding 60% of lineitems + a cold tail."""
    rng = np.random.default_rng(5)
    hub = 7
    cold = rng.integers(100, 4000, 2000)
    keys = np.concatenate([np.full(3000, hub), cold])
    li = pa.table(
        {
            "l_orderkey": pa.array(keys, pa.int64()),
            "l_extendedprice": pa.array(
                np.round(rng.random(len(keys)) * 100, 2), pa.float64()
            ),
            "l_discount": pa.array(
                np.round(rng.random(len(keys)) * 0.1, 2), pa.float64()
            ),
        }
    )
    okeys = np.unique(keys)
    orders = pa.table(
        {
            "o_orderkey": pa.array(okeys, pa.int64()),
            "o_custkey": pa.array(okeys, pa.int64()),
            "o_orderstatus": pa.array(
                np.array(["O", "F", "P"])[okeys % 3], pa.string()
            ),
            "o_totalprice": pa.array(np.zeros(len(okeys)), pa.float64()),
            "o_orderdate": pa.array(
                np.zeros(len(okeys), dtype="datetime64[us]")
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * len(okeys), pa.string()),
        }
    )
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    return li, orders


@pytest.mark.usefixtures("ray_session")
class TestSaltedJoin:
    def test_skewed_result_matches_pandas(self, tmp_path):
        li, orders = _skewed_tables(tmp_path)
        from anansi_ray.pipelines.queries import q_order_lineitem_join_salted

        got = q_order_lineitem_join_salted(str(tmp_path)).to_pandas()
        ldf, odf = li.to_pandas(), orders.to_pandas()
        ldf["revenue"] = ldf["l_extendedprice"] * (1 - ldf["l_discount"])
        ref = (
            ldf.merge(odf, left_on="l_orderkey", right_on="o_orderkey")
            .groupby("o_orderstatus", as_index=False)
            .agg(revenue=("revenue", "sum"), n_items=("revenue", "size"))
            .sort_values("o_orderstatus")
            .reset_index(drop=True)
        )
        ref["revenue"] = ref["revenue"].round(2)
        assert got["o_orderstatus"].tolist() == ref["o_orderstatus"].tolist()
        assert got["n_items"].tolist() == ref["n_items"].tolist()
        np.testing.assert_allclose(
            got["revenue"].to_numpy(), ref["revenue"].to_numpy(), atol=1e-6
        )

    def test_hub_key_is_detected_hot(self, tmp_path):
        """The detection threshold must flag the hub (the salt fan-out path
        is only exercised when it does)."""
        li, _ = _skewed_tables(tmp_path)
        counts = pd.Series(li["l_orderkey"].to_numpy()).value_counts()
        assert counts.iloc[0] > 4.0 * counts.mean()
