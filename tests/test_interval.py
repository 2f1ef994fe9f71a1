"""Interval join (functions/interval.py): rank-pack + prefix-sum kernel
edge cases + distributed equivalence against a brute-force reference."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anansi_ray.functions.interval import interval_join_agg


def _run(points_tbl, iv_tbl, length, n_parts=4):
    out = interval_join_agg(
        rd.from_arrow(points_tbl),
        rd.from_arrow(iv_tbl),
        key="k",
        point_t="t",
        point_val="v",
        interval_key="k",
        interval_lo="lo",
        interval_len_us=length,
        interval_carry=["iid"],
        n_parts=n_parts,
    )
    rows = sorted(out.take_all(), key=lambda r: r["iid"])
    return [(r["iid"], r["n_points"], round(r["sum_val"], 6)) for r in rows]


def _brute(points_tbl, iv_tbl, length):
    pts = points_tbl.to_pylist()
    res = []
    for iv in iv_tbl.to_pylist():
        hit = [
            p["v"]
            for p in pts
            if p["k"] == iv["k"] and iv["lo"] <= p["t"] < iv["lo"] + length
        ]
        res.append((iv["iid"], len(hit), round(sum(hit), 6)))
    return sorted(res)


@pytest.mark.usefixtures("ray_session")
class TestIntervalJoin:
    def test_window_inclusive_exclusive(self):
        pts = pa.table({"k": [1, 1, 1], "t": [5, 9, 10], "v": [1.0, 2.0, 4.0]})
        ivs = pa.table({"k": [1], "lo": [5], "iid": [0]})
        # [5, 10): t=5 in, t=9 in, t=10 out
        assert _run(pts, ivs, 5) == [(0, 2, 3.0)]

    def test_empty_window_zero_filled(self):
        pts = pa.table({"k": [1], "t": [100], "v": [9.0]})
        ivs = pa.table({"k": [1, 2], "lo": [0, 0], "iid": [0, 1]})
        assert _run(pts, ivs, 50) == [(0, 0, 0.0), (1, 0, 0.0)]

    def test_no_cross_key_leakage(self):
        pts = pa.table({"k": [1], "t": [5], "v": [3.0]})
        ivs = pa.table({"k": [2], "lo": [0], "iid": [0]})
        assert _run(pts, ivs, 100) == [(0, 0, 0.0)]

    def test_overlapping_intervals_independent(self):
        pts = pa.table({"k": [1, 1], "t": [3, 7], "v": [1.0, 10.0]})
        ivs = pa.table({"k": [1, 1], "lo": [0, 5], "iid": [0, 1]})
        assert _run(pts, ivs, 10) == [(0, 2, 11.0), (1, 1, 10.0)]

    def test_matches_brute_force_many_parts(self):
        rng = np.random.default_rng(11)
        n_p, n_iv = 500, 150
        pts = pa.table(
            {
                "k": pa.array(rng.integers(0, 15, n_p), pa.int64()),
                "t": pa.array(rng.integers(0, 1000, n_p), pa.int64()),
                "v": pa.array(rng.random(n_p).round(3), pa.float64()),
            }
        )
        ivs = pa.table(
            {
                "k": pa.array(rng.integers(0, 15, n_iv), pa.int64()),
                "lo": pa.array(rng.integers(0, 1000, n_iv), pa.int64()),
                "iid": pa.array(np.arange(n_iv), pa.int64()),
            }
        )
        assert _run(pts, ivs, 120, n_parts=8) == _brute(pts, ivs, 120)
