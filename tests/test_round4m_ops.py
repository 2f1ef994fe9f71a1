"""Round-4 thirteenth-batch operator semantics: fact⋈dim return rates,
order-to-ship latency quantiles, per-doc hapax/lexical stats — pinned
against independent pandas twins on sf0.001.
"""
from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from anansi_ray.pipelines.queries import (
    q_hapax_stats,
    q_part_return_rates,
    q_ship_latency,
)

SF0001 = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _pdf(name, columns=None):
    return pq.read_table(f"{SF0001}/{name}.parquet", columns=columns).to_pandas()


class TestPartReturnRates:
    def test_vs_pandas_join(self):
        got = q_part_return_rates(SF0001).to_pandas()
        li = _pdf("lineitem", ["l_partkey", "l_returnflag"])
        pt = _pdf("part", ["p_partkey", "p_brand"])
        j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
        want = (
            j.groupby("p_brand")
            .agg(
                n_lineitems=("l_partkey", "size"),
                n_returned=("l_returnflag", lambda s: int((s == "R").sum())),
            )
            .reset_index()
            .sort_values("p_brand")
        )
        want["n_lineitems"] = want["n_lineitems"].astype("int64")
        want["n_returned"] = want["n_returned"].astype("int64")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_totals_conserve(self):
        got = q_part_return_rates(SF0001).to_pandas()
        li = _pdf("lineitem", ["l_partkey"])
        assert int(got["n_lineitems"].sum()) == len(li)


class TestShipLatency:
    def test_vs_pandas_twin(self):
        got = q_ship_latency(SF0001).to_pandas()
        li = _pdf("lineitem", ["l_orderkey", "l_shipdate"])
        od = _pdf("orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
        li["sd"] = li["l_shipdate"].astype("int64") // DAY_US
        first = li.groupby("l_orderkey")["sd"].min()
        od["od"] = od["o_orderdate"].astype("int64") // DAY_US
        od["gap"] = first.reindex(od["o_orderkey"]).to_numpy() - od["od"]
        od = od.dropna(subset=["gap"])
        rows = []
        for pri, grp in od.groupby("o_orderpriority"):
            g = np.sort(grp["gap"].to_numpy().astype("int64"))
            n = len(g)
            rows.append(
                (
                    pri,
                    n,
                    int(g[int(np.ceil(0.5 * n)) - 1]),
                    int(g[int(np.ceil(0.9 * n)) - 1]),
                )
            )
        want = pd.DataFrame(
            rows, columns=["o_orderpriority", "n_orders", "p50_days", "p90_days"]
        ).sort_values("o_orderpriority")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


class TestHapaxStats:
    def test_vs_python_counter(self):
        got = q_hapax_stats(SF0001).to_pandas().set_index("doc_id")
        docs = _pdf("documents", ["doc_id", "text"])
        for did, text in zip(docs["doc_id"], docs["text"]):
            toks = re.findall(r"\w+", (text or "").lower())
            c = Counter(toks)
            assert got.loc[did, "n_tok"] == len(toks)
            assert got.loc[did, "n_types"] == len(c)
            assert got.loc[did, "n_hapax"] == sum(1 for v in c.values() if v == 1)

    def test_invariants(self):
        got = q_hapax_stats(SF0001).to_pandas()
        assert (got["n_hapax"] <= got["n_types"]).all()
        assert (got["n_types"] <= got["n_tok"]).all()
