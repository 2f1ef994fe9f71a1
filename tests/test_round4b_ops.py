"""Round-4 second-batch operator semantics: snowflake join, triangle
enumeration, bloom-pruned semi join, gap-fill densification, grouped exact
median — each pinned against an independent pandas/set twin on sf0.001.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from anansi_ray.pipelines.queries import (
    q_customer_median_order,
    q_events_gap_fill,
    q_link_triangles,
    q_orders_bloom_filter,
    q_region_revenue,
)

SF0001 = "/root/testdata/sf0.001"


def _pdf(name, columns=None):
    return pq.read_table(f"{SF0001}/{name}.parquet", columns=columns).to_pandas()


class TestRegionRevenue:
    def test_vs_pandas_twin(self):
        got = q_region_revenue(SF0001).to_pandas()
        li = _pdf("lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
        od = _pdf("orders", ["o_orderkey", "o_custkey"])
        cu = _pdf("customer", ["c_custkey", "c_nationkey"])
        na = _pdf("nation", ["n_nationkey", "n_regionkey"])
        re = _pdf("region", ["r_regionkey", "r_name"])
        j = (
            li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
            .merge(cu, left_on="o_custkey", right_on="c_custkey")
            .merge(na, left_on="c_nationkey", right_on="n_nationkey")
            .merge(re, left_on="n_regionkey", right_on="r_regionkey")
        )
        j["rev"] = j["l_extendedprice"] * (1 - j["l_discount"])
        exp = (
            j.groupby("r_name", as_index=False)
            .agg(revenue=("rev", "sum"), n_items=("rev", "size"))
            .sort_values("r_name")
            .reset_index(drop=True)
        )
        assert list(got["r_name"]) == list(exp["r_name"])
        assert list(got["n_items"]) == list(exp["n_items"])
        np.testing.assert_allclose(
            got["revenue"].to_numpy(), exp["revenue"].round(2).to_numpy(), atol=0.011
        )


class TestLinkTriangles:
    def test_vs_set_twin(self):
        n = len(_pdf("documents", ["doc_id"]))
        edges = set()
        for i in range(n):
            for y in ((i + 1) % n, (i + 2) % n, (3 * i + 7) % n):
                if i != y:
                    edges.add((min(i, y), max(i, y)))
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
        exp = sorted(
            (a, b, c)
            for a, nbrs in adj.items()
            for b in nbrs
            for c in nbrs
            if b < c and (b, c) in edges
        )
        got = [tuple(r) for r in q_link_triangles(SF0001).to_pandas().to_numpy()]
        assert got == exp
        # the (i, i+1, i+2) family guarantees a non-trivial oracle
        assert len(exp) >= n


class TestBloomSemiJoin:
    def test_vs_pandas_twin(self):
        got = q_orders_bloom_filter(SF0001).to_pandas()
        od = _pdf("orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        cu = _pdf("customer", ["c_custkey", "c_mktsegment"])
        keys = set(cu.loc[cu["c_mktsegment"] == "BUILDING", "c_custkey"])
        exp = (
            od[od["o_custkey"].isin(keys)]
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


class TestGapFill:
    def test_vs_pandas_twin(self):
        got = q_events_gap_fill(SF0001).to_pandas()
        ev = _pdf("events", ["event_type", "ts"])
        hr = ev["ts"].astype("int64") // 3_600_000_000
        c = (
            pd.DataFrame({"event_type": ev["event_type"], "hour_b": hr})
            .groupby(["event_type", "hour_b"])
            .size()
        )
        lo, hi = int(hr.min()), int(hr.max())
        types = sorted(ev["event_type"].unique())
        # full grid, zero-filled
        idx = pd.MultiIndex.from_product([types, range(lo, hi + 1)],
                                         names=["event_type", "hour_b"])
        exp = c.reindex(idx, fill_value=0).reset_index(name="n")
        exp["n"] = exp["n"].astype("int64")
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
        # densification is real: gaps exist and totals are conserved
        assert (got["n"] == 0).any()
        assert got["n"].sum() == len(ev)
        assert len(got) == len(types) * (hi - lo + 1)


class TestGroupedMedian:
    def test_vs_pandas_twin(self):
        got = q_customer_median_order(SF0001).to_pandas()
        od = _pdf("orders", ["o_custkey", "o_totalprice"])
        od["cents"] = np.round(od["o_totalprice"] * 100).astype("int64")

        def lower_median(s):
            v = np.sort(s.to_numpy())
            return int(v[(len(v) - 1) // 2])

        exp = (
            od.groupby("o_custkey")
            .agg(n_orders=("cents", "size"), median_cents=("cents", lower_median))
            .reset_index()
            .sort_values("o_custkey")
            .reset_index(drop=True)
        )
        exp["n_orders"] = exp["n_orders"].astype("int64")
        exp["median_cents"] = exp["median_cents"].astype("int64")
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


class TestIntervalUnion:
    def test_query_vs_pandas_twin(self):
        from anansi_ray.pipelines.queries import q_user_active_time

        got = q_user_active_time(SF0001).to_pandas()
        ev = _pdf("events", ["user_id", "ts"])
        LEN = 1_800_000_000
        rows = []
        for uid, g in ev.groupby("user_id"):
            s = np.sort(g["ts"].astype("int64").to_numpy())
            n_int, covered, cur_s, cur_e = 0, 0, None, None
            for x in s:
                if cur_e is None or x > cur_e:
                    if cur_e is not None:
                        covered += cur_e - cur_s
                    n_int, cur_s, cur_e = n_int + 1, x, x + LEN
                else:
                    cur_e = max(cur_e, x + LEN)
            covered += cur_e - cur_s
            rows.append((uid, n_int, covered))
        exp = pd.DataFrame(rows, columns=["user_id", "n_intervals", "covered_us"])
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)

    def test_sweep_variable_lengths_fuzz(self):
        """The kernel handles VARIABLE-length intervals (the sf tables only
        exercise constant length): fuzz vs a per-key brute-force union."""
        from anansi_ray.functions.events import interval_union_sweep

        rng = np.random.default_rng(7)
        for trial in range(20):
            n = int(rng.integers(1, 200))
            u = rng.integers(0, 9, n).astype(np.int64)
            s = rng.integers(0, 1000, n).astype(np.int64)
            e = s + rng.integers(1, 50, n).astype(np.int64)
            uu, n_int, covered = interval_union_sweep(u, s, e)
            for k, ni, cov in zip(uu, n_int, covered):
                ivs = sorted(
                    (int(a), int(b)) for a, b, kk in zip(s, e, u) if kk == k
                )
                merged = []
                for a, b in ivs:
                    if merged and a <= merged[-1][1]:
                        merged[-1][1] = max(merged[-1][1], b)
                    else:
                        merged.append([a, b])
                assert ni == len(merged)
                assert cov == sum(b - a for a, b in merged)
            assert sorted(uu) == sorted(set(u.tolist()))
