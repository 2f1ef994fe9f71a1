"""Round-4 fifth-batch operator semantics: Markov transition counts,
time-weighted per-user aggregates, per-dimension embedding moments,
type×hour mutual information — each pinned against an independent
pandas/numpy twin on sf0.001.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from anansi_ray.pipelines.queries import (
    q_embedding_stats,
    q_event_transitions,
    q_type_hour_mi,
    q_user_twap,
)

SF0001 = "/root/testdata/sf0.001"


def _pdf(name, columns=None):
    return pq.read_table(f"{SF0001}/{name}.parquet", columns=columns).to_pandas()


def _timeline():
    ev = _pdf("events", ["event_id", "ts", "user_id", "event_type", "value"])
    ev["t"] = ev["ts"].astype("int64")
    return ev.sort_values(["user_id", "t", "event_id"])


class TestEventTransitions:
    def test_vs_pandas_shift(self):
        got = q_event_transitions(SF0001).to_pandas()
        ev = _timeline()
        ev["nxt"] = ev.groupby("user_id")["event_type"].shift(-1)
        want = (
            ev.dropna(subset=["nxt"])
            .groupby(["event_type", "nxt"])
            .size()
            .reset_index(name="n")
            .rename(columns={"event_type": "from_type", "nxt": "to_type"})
            .sort_values(["from_type", "to_type"])
        )
        want["n"] = want["n"].astype("int64")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_total_is_rows_minus_users(self):
        got = q_event_transitions(SF0001).to_pandas()
        ev = _pdf("events", ["user_id"])
        assert int(got["n"].sum()) == len(ev) - ev["user_id"].nunique()


class TestUserTwap:
    def test_vs_pandas_shift(self):
        got = q_user_twap(SF0001).to_pandas()
        ev = _timeline()
        ev["vfp"] = np.floor(ev["value"].to_numpy() * 10000.0).astype("int64")
        ev["nt"] = ev.groupby("user_id")["t"].shift(-1)
        ev = ev.dropna(subset=["nt"])
        ev["gap_s"] = ((ev["nt"].astype("int64") - ev["t"]) // 1_000_000).astype(
            "int64"
        )
        ev["wv"] = ev["vfp"] * ev["gap_s"]
        want = (
            ev.groupby("user_id")
            .agg(n_gaps=("gap_s", "size"), sum_gap_s=("gap_s", "sum"), sum_wv=("wv", "sum"))
            .reset_index()
            .sort_values("user_id")
        )
        for c in ("n_gaps", "sum_gap_s", "sum_wv"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


class TestEmbeddingStats:
    def test_vs_numpy(self):
        got = q_embedding_stats(SF0001).to_pandas()
        m = np.vstack(
            _pdf("embeddings", ["embedding"])["embedding"].to_numpy()
        ).astype(np.float64)
        assert (got["n"] == m.shape[0]).all()
        assert list(got["dim"]) == list(range(1, m.shape[1] + 1))
        np.testing.assert_allclose(
            got["sum_v"].to_numpy(), m.sum(axis=0), rtol=0, atol=2e-4
        )
        np.testing.assert_allclose(
            got["sum_v2"].to_numpy(), (m * m).sum(axis=0), rtol=0, atol=2e-4
        )


class TestTypeHourMI:
    def test_vs_numpy_joint(self):
        got = q_type_hour_mi(SF0001).to_pandas()
        ev = _pdf("events", ["event_type", "ts"])
        hr = ev["ts"].astype("int64") // 3_600_000_000 % 24
        joint = (
            pd.crosstab(ev["event_type"], hr).to_numpy().astype(np.float64)
        )
        n = joint.sum()
        px = joint.sum(axis=1, keepdims=True)
        py = joint.sum(axis=0, keepdims=True)
        nz = joint > 0
        mi = float((joint[nz] / n * np.log(joint[nz] * n / (px @ py)[nz])).sum())
        assert int(got["n"][0]) == int(n)
        assert abs(float(got["mi_nats"][0]) - mi) < 1e-6

    def test_mi_nonnegative(self):
        got = q_type_hour_mi(SF0001).to_pandas()
        assert float(got["mi_nats"][0]) >= 0.0
