"""As-of join (functions/asof.py): kernel edge cases + distributed
equivalence against a tiny brute-force reference."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from anansi_ray.functions.asof import asof_join


def _run(probe_tbl, build_tbl, n_parts=4):
    out = asof_join(
        rd.from_arrow(probe_tbl),
        rd.from_arrow(build_tbl),
        key="k",
        probe_on="t",
        build_on="bt",
        probe_carry=["pid"],
        build_payload=["val"],
        build_tiebreak="val",
        n_parts=n_parts,
    )
    rows = sorted(out.take_all(), key=lambda r: r["pid"])
    return [(r["pid"], r["matched"], r["val"]) for r in rows]


def _brute(probe_tbl, build_tbl):
    res = []
    b = build_tbl.to_pylist()
    for p in probe_tbl.to_pylist():
        cands = [r for r in b if r["k"] == p["k"] and r["bt"] <= p["t"]]
        if cands:
            best_t = max(r["bt"] for r in cands)
            best = max(r["val"] for r in cands if r["bt"] == best_t)
            res.append((p["pid"], True, best))
        else:
            res.append((p["pid"], False, 0))
    return sorted(res)


@pytest.mark.usefixtures("ray_session")
class TestAsofJoin:
    def test_basic_backward_match(self):
        probe = pa.table({"k": [1, 1, 2], "t": [10, 5, 10], "pid": [0, 1, 2]})
        build = pa.table({"k": [1, 1, 2], "bt": [4, 8, 20], "val": [100, 200, 300]})
        assert _run(probe, build) == [
            (0, True, 200),   # t=10 sees bt=8
            (1, True, 100),   # t=5 sees bt=4
            (2, False, 0),    # only build at bt=20 > 10
        ]

    def test_inclusive_equal_timestamp(self):
        probe = pa.table({"k": [1], "t": [7], "pid": [0]})
        build = pa.table({"k": [1], "bt": [7], "val": [42]})
        assert _run(probe, build) == [(0, True, 42)]

    def test_tie_break_max_wins(self):
        # two build rows at the same (k, bt): greatest tiebreak value wins
        probe = pa.table({"k": [1], "t": [9], "pid": [0]})
        build = pa.table({"k": [1, 1], "bt": [5, 5], "val": [10, 30]})
        assert _run(probe, build) == [(0, True, 30)]

    def test_no_cross_key_leakage(self):
        # key 2's probe must not see key 1's earlier build row
        probe = pa.table({"k": [2], "t": [100], "pid": [0]})
        build = pa.table({"k": [1], "bt": [1], "val": [7]})
        assert _run(probe, build) == [(0, False, 0)]

    def test_matches_brute_force_many_parts(self):
        rng = np.random.default_rng(7)
        n_p, n_b = 300, 120
        probe = pa.table(
            {
                "k": pa.array(rng.integers(0, 20, n_p), pa.int64()),
                "t": pa.array(rng.integers(0, 1000, n_p), pa.int64()),
                "pid": pa.array(np.arange(n_p), pa.int64()),
            }
        )
        build = pa.table(
            {
                "k": pa.array(rng.integers(0, 20, n_b), pa.int64()),
                "bt": pa.array(rng.integers(0, 1000, n_b), pa.int64()),
                "val": pa.array(rng.integers(1, 10_000, n_b), pa.int64()),
            }
        )
        assert _run(probe, build, n_parts=8) == _brute(probe, build)

    def test_empty_build_side(self):
        probe = pa.table({"k": [1, 2], "t": [1, 2], "pid": [0, 1]})
        build = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "bt": pa.array([], pa.int64()),
                "val": pa.array([], pa.int64()),
            }
        )
        assert _run(probe, build) == [(0, False, 0), (1, False, 0)]
