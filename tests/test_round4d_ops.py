"""Round-4 fourth-batch operator semantics: gaps-and-islands streaks,
median-absolute-deviation outliers, winsorized aggregates, first-occurrence
token novelty, market-basket pair mining — each pinned against an
independent pandas/python twin on sf0.001 (the DuckDB value oracle runs
separately through tools/check_queries.py).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from anansi_ray.pipelines.queries import (
    q_orders_mad_outliers,
    q_orders_winsorized,
    q_part_copurchase,
    q_token_novelty,
    q_user_streaks,
)

SF0001 = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _pdf(name, columns=None):
    return pq.read_table(f"{SF0001}/{name}.parquet", columns=columns).to_pandas()


class TestUserStreaks:
    def test_vs_python_islands(self):
        got = q_user_streaks(SF0001).to_pandas()
        ev = _pdf("events", ["user_id", "ts"])
        ev["dayno"] = ev["ts"].astype("int64") // DAY_US
        want_rows = []
        for uid, grp in ev.groupby("user_id"):
            days = sorted(set(grp["dayno"]))
            best = run = 1
            for a, b in zip(days, days[1:]):
                run = run + 1 if b == a + 1 else 1
                best = max(best, run)
            want_rows.append((uid, best, len(days)))
        want = pd.DataFrame(
            want_rows, columns=["user_id", "max_streak", "n_days"]
        ).sort_values("user_id")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_streak_bounded_by_days(self):
        got = q_user_streaks(SF0001).to_pandas()
        assert (got["max_streak"] >= 1).all()
        assert (got["max_streak"] <= got["n_days"]).all()


def _cents(prices: pd.Series) -> np.ndarray:
    # same half-to-even rounding as the pyarrow kernel / DuckDB round()
    # disagreement is impossible on this fixture: prices are 2-decimal
    return np.round(prices.to_numpy() * 100.0).astype(np.int64)


def _lower_median(v: np.ndarray) -> int:
    s = np.sort(v)
    n = len(s)
    return int(s[int(np.ceil(0.5 * n)) - 1])


class TestMadOutliers:
    def test_vs_python_twin(self):
        got = q_orders_mad_outliers(SF0001).to_pandas()
        od = _pdf("orders", ["o_orderpriority", "o_totalprice"])
        od["cents"] = _cents(od["o_totalprice"])
        rows = []
        for pri, grp in od.groupby("o_orderpriority"):
            v = grp["cents"].to_numpy()
            med = _lower_median(v)
            dev = np.abs(v - med)
            mad = _lower_median(dev)
            rows.append((pri, len(v), med, mad, int((dev > 3 * mad).sum())))
        want = pd.DataFrame(
            rows,
            columns=["o_orderpriority", "n", "median_cents", "mad_cents", "n_outliers"],
        ).sort_values("o_orderpriority")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


class TestWinsorized:
    def test_vs_python_twin(self):
        got = q_orders_winsorized(SF0001).to_pandas()
        od = _pdf("orders", ["o_orderstatus", "o_totalprice"])
        od["cents"] = _cents(od["o_totalprice"])
        s = np.sort(od["cents"].to_numpy())
        n = len(s)
        lo = int(s[int(np.ceil(0.01 * n)) - 1])
        hi = int(s[int(np.ceil(0.99 * n)) - 1])
        od["wc"] = od["cents"].clip(lo, hi)
        want = (
            od.groupby("o_orderstatus")["wc"]
            .agg(n="count", sum_wcents="sum", min_wcents="min", max_wcents="max")
            .reset_index()
            .sort_values("o_orderstatus")
        )
        for c in ("n", "sum_wcents", "min_wcents", "max_wcents"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_clip_tightens_range(self):
        got = q_orders_winsorized(SF0001).to_pandas()
        od = _pdf("orders", ["o_totalprice"])
        raw_lo, raw_hi = _cents(od["o_totalprice"]).min(), _cents(od["o_totalprice"]).max()
        assert got["min_wcents"].min() >= raw_lo
        assert got["max_wcents"].max() <= raw_hi


class TestTokenNovelty:
    def test_vs_python_twin(self):
        import re

        got = q_token_novelty(SF0001).to_pandas()
        docs = _pdf("documents", ["doc_id", "text"]).sort_values("doc_id")
        first: dict[str, int] = {}
        per_doc = {}
        for did, text in zip(docs["doc_id"], docs["text"]):
            toks = set(re.findall(r"\w+", (text or "").lower()))
            per_doc[did] = toks
            for t in toks:
                if t not in first or did < first[t]:
                    first[t] = did
        rows = [
            (
                did,
                len(per_doc[did]),
                sum(1 for t in per_doc[did] if first[t] == did),
            )
            for did in docs["doc_id"]
        ]
        want = pd.DataFrame(rows, columns=["doc_id", "n_distinct", "n_novel"])
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_novelty_totals(self):
        # every token is novel in exactly one doc: sum(n_novel) == |vocab|
        got = q_token_novelty(SF0001).to_pandas()
        docs = _pdf("documents", ["text"])
        import re

        vocab = set()
        for text in docs["text"]:
            vocab.update(re.findall(r"\w+", (text or "").lower()))
        assert int(got["n_novel"].sum()) == len(vocab)
        assert (got["n_novel"] <= got["n_distinct"]).all()


class TestPartCopurchase:
    def test_vs_python_twin(self):
        got = q_part_copurchase(SF0001).to_pandas()
        li = _pdf("lineitem", ["l_orderkey", "l_partkey"]).drop_duplicates()
        from collections import Counter
        from itertools import combinations

        cnt: Counter = Counter()
        for _, grp in li.groupby("l_orderkey"):
            for a, b in combinations(sorted(grp["l_partkey"]), 2):
                cnt[(a, b)] += 1
        want = pd.DataFrame(
            [(a, b, n) for (a, b), n in cnt.items()], columns=["p1", "p2", "n"]
        ).sort_values(["n", "p1", "p2"], ascending=[False, True, True]).head(100)
        want["n"] = want["n"].astype("int64")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_pairs_ordered(self):
        got = q_part_copurchase(SF0001).to_pandas()
        assert (got["p1"] < got["p2"]).all()
        assert len(got) <= 100
