"""HLL sketch + lag/lead window operator tests."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from anansi_ray.functions import sketch as sk


class TestHllKernel:
    def test_bit_length_exact_on_edges(self):
        # the vectorized 6-step binary search must agree with int.bit_length
        # everywhere, including around 2^53 where float64 exponents misround
        vals = [1, 2, 3, 2**52 - 1, 2**52, 2**53 - 1, 2**53, 2**53 + 1,
                2**63 - 1, 2**63, 2**64 - 1]
        x = np.array(vals, dtype=np.uint64)
        bl = np.zeros(len(x), np.uint64)
        for s in (32, 16, 8, 4, 2, 1):
            big = x >= (np.uint64(1) << np.uint64(s))
            bl[big] += np.uint64(s)
            x[big] >>= np.uint64(s)
        bl += x
        assert [int(b) for b in bl] == [int(v).bit_length() for v in vals]

    def test_partial_is_mergeable(self):
        """max-merge of two batch partials == partial of the concatenation."""
        rng = np.random.default_rng(7)
        ids = rng.integers(0, 10**9, 5000)
        grp = np.array(["x", "y"])[rng.integers(0, 2, 5000)]
        tbl = pa.table(
            {"k": pa.array(ids, pa.int64()), "g": pa.array(grp, pa.string())}
        )
        whole = sk.hll_partial_batch(tbl, "k", "g").to_pandas()
        a = sk.hll_partial_batch(tbl.slice(0, 2500), "k", "g").to_pandas()
        b = sk.hll_partial_batch(tbl.slice(2500), "k", "g").to_pandas()
        import pandas as pd

        merged = (
            pd.concat([a, b])
            .groupby(["g", "register"], as_index=False)["rho"]
            .max()
        )
        w = whole.sort_values(["g", "register"]).reset_index(drop=True)
        m = merged.sort_values(["g", "register"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(w[["g", "register", "rho"]], m)

    def test_estimate_within_bound(self):
        rng = np.random.default_rng(3)
        for exact in (100, 5_000, 80_000):
            ids = rng.choice(10**12, exact, replace=False)
            dense = np.zeros(sk.HLL_M, np.int64)
            part = sk.hll_partial_batch(
                pa.table(
                    {
                        "k": pa.array(ids, pa.int64()),
                        "g": pa.array(["g"] * exact, pa.string()),
                    }
                ),
                "k",
                "g",
            ).to_pandas()
            dense[part["register"]] = part["rho"]
            est = sk.hll_estimate(dense)
            assert abs(est - exact) / exact < 0.05, (exact, est)


@pytest.mark.usefixtures("ray_session")
class TestSketchDistributed:
    def test_approx_vs_exact_on_events(self):
        sf = "/root/testdata/sf0.01"
        from anansi_ray.pipelines.queries import (
            q_approx_distinct_users,
            q_distinct_users_exact,
        )

        exact = {
            r["event_type"]: r["n_distinct"]
            for r in q_distinct_users_exact(sf).to_pylist()
        }
        approx = {
            r["event_type"]: r["approx_distinct"]
            for r in q_approx_distinct_users(sf).to_pylist()
        }
        assert set(exact) == set(approx)
        for k, ex in exact.items():
            assert abs(approx[k] - ex) / ex < 0.05, (k, ex, approx[k])


@pytest.mark.usefixtures("ray_session")
class TestLagLeadWindow:
    def test_vs_pandas_window(self):
        import pandas as pd
        import ray.data as rd

        from anansi_ray.functions.events import lag_lead_window

        rng = np.random.default_rng(11)
        n = 4000
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.integers(0, 97, n),
                "ts": rng.integers(0, 10**6, n),
                "value": np.round(rng.random(n) * 100, 3),
            }
        )
        got = (
            lag_lead_window(rd.from_pandas(df))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
        g = ref.groupby("user_id", sort=False)
        ref["rn"] = g.cumcount() + 1
        ref["prev_value"] = g["value"].shift(1)
        ref["next_value"] = g["value"].shift(-1)
        ref["delta"] = np.round(ref["value"] - ref["prev_value"], 6)
        ref = ref.sort_values("event_id").reset_index(drop=True)
        for col in ("rn", "prev_value", "next_value", "delta"):
            pd.testing.assert_series_equal(
                got[col], ref[col], check_names=False, check_dtype=False
            )


@pytest.mark.usefixtures("ray_session")
class TestCountMin:
    def test_block_layout_invariant_and_overestimate(self):
        import ray.data as rd

        from anansi_ray.functions.sketch import CMS_PROBES, cms_counts

        rng = np.random.default_rng(5)
        vocab = ["the", "a", "data", "hash", "join", "x1", "x2", "x3", "x4"]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(2, 50)))
            for _ in range(200)
        ]
        t = pa.table({"text": pa.array(texts, pa.string())})
        outs = [
            cms_counts(rd.from_arrow(t).repartition(nb)).to_pandas()
            for nb in (1, 3, 8)
        ]
        # linear sketch: partial merge is exact, so layout cannot matter
        assert outs[0].equals(outs[1]) and outs[0].equals(outs[2])
        out = outs[0]
        # CMS invariant: estimate never undercounts
        assert (out["cms_est"] >= out["exact_cnt"]).all()
        # absent probe has exact 0
        assert out[out["token"] == "zzz_absent"]["exact_cnt"].iloc[0] == 0
        assert len(out) == len(CMS_PROBES)

    def test_empty_corpus(self):
        import ray.data as rd

        from anansi_ray.functions.sketch import cms_counts

        t = pa.table({"text": pa.array([], pa.string())})
        out = cms_counts(rd.from_arrow(t)).to_pandas()
        assert (out["exact_cnt"] == 0).all() and (out["cms_est"] == 0).all()
