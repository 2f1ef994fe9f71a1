"""Round-4 eleventh-batch operator semantics: exact Gini coefficient from
the value histogram, Naive-Bayes token-count training table — pinned
against independent pandas twins on sf0.001.
"""
from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from anansi_ray.pipelines.queries import q_gini_coefficient, q_nb_token_model

SF0001 = "/root/testdata/sf0.001"


def _pdf(name, columns=None):
    return pq.read_table(f"{SF0001}/{name}.parquet", columns=columns).to_pandas()


class TestGini:
    def test_vs_sorted_formula(self):
        got = q_gini_coefficient(SF0001).to_pandas()
        od = _pdf("orders", ["o_custkey", "o_totalprice"])
        od["cents"] = np.round(od["o_totalprice"].to_numpy() * 100.0).astype("int64")
        rev = np.sort(od.groupby("o_custkey")["cents"].sum().to_numpy())
        n = len(rev)
        ranks = np.arange(1, n + 1)
        gini = 2.0 * float((ranks * rev).sum()) / (n * rev.sum()) - (n + 1) / n
        assert int(got["n_customers"][0]) == n
        assert abs(float(got["gini"][0]) - gini) < 1e-6

    def test_range(self):
        got = q_gini_coefficient(SF0001).to_pandas()
        assert 0.0 <= float(got["gini"][0]) < 1.0


class TestNBTokenModel:
    def test_vs_python_counter(self):
        got = q_nb_token_model(SF0001).to_pandas()
        docs = _pdf("documents", ["lang", "text"])
        cnt: Counter = Counter()
        for lang, text in zip(docs["lang"], docs["text"]):
            for t in re.findall(r"\w+", (text or "").lower()):
                cnt[(lang, t)] += 1
        rows = pd.DataFrame(
            [(l, t, n) for (l, t), n in cnt.items()], columns=["lang", "token", "cnt"]
        )
        want = (
            rows.sort_values(["lang", "cnt", "token"], ascending=[True, False, True])
            .groupby("lang", sort=False)
            .head(20)
            .reset_index(drop=True)
        )
        want["cnt"] = want["cnt"].astype("int64")
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    def test_twenty_per_lang(self):
        got = q_nb_token_model(SF0001).to_pandas()
        sizes = got.groupby("lang").size()
        assert (sizes <= 20).all()
