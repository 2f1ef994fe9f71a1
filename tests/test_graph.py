"""PageRank / funnel / collect-list / variance operator tests: each new
distributed kernel against an independent single-threaded twin."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _pagerank_sequential(n: int, iters: int) -> list[int]:
    """Independent twin: plain Python dict-of-ints PageRank over the same
    synthetic graph (i -> (2i+1)%N, (3i+7)%N), same integer arithmetic."""
    ranks = [1_000_000_000] * n
    for _ in range(iters):
        nxt = [150_000_000] * n
        for i in range(n):
            c = (85 * (ranks[i] // 2)) // 100
            nxt[(2 * i + 1) % n] += c
            nxt[(3 * i + 7) % n] += c
        ranks = nxt
    return ranks


class TestPagerank:
    @pytest.mark.parametrize("n,iters", [(1, 1), (13, 3), (500, 3)])
    def test_matches_sequential_twin(self, ray_session, n, iters):
        import ray.data as rd

        from anansi_ray.functions.graph import pagerank_integer

        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
        )
        got = pagerank_integer(docs, n, iters=iters)
        exp = _pagerank_sequential(n, iters)
        assert got["doc_id"].to_pylist() == list(range(n))
        assert got["pr"].to_pylist() == exp

    def test_block_layout_independent(self, ray_session):
        """Same result across block layouts (determinism contract)."""
        import ray.data as rd

        from anansi_ray.functions.graph import pagerank_integer

        n = 200
        tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
        a = pagerank_integer(rd.from_arrow(tbl), n, iters=2)
        b = pagerank_integer(
            rd.from_arrow(tbl).repartition(17), n, iters=2
        )
        assert a["pr"].to_pylist() == b["pr"].to_pylist()


class TestPagerankResume:
    def test_kill_and_resume_bitequal(self, ray_session, tmp_path):
        """Kill between supersteps (stop_after hook), resume from the
        committed checkpoint → bit-equal to the uninterrupted run; the
        resumed job must start from the checkpoint, not iteration 0."""
        import ray.data as rd

        from anansi_ray.functions.graph import (
            _latest_pr_checkpoint,
            pagerank_integer,
        )

        n, iters = 120, 4
        tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
        want = pagerank_integer(rd.from_arrow(tbl), n, iters=iters)

        ck = str(tmp_path / "pr_ck")
        killed = pagerank_integer(
            rd.from_arrow(tbl), n, iters=iters, checkpoint_dir=ck, stop_after=2
        )
        assert killed is None
        latest = _latest_pr_checkpoint(ck)
        assert latest is not None and latest[0] == 1  # supersteps 0,1 done

        got = pagerank_integer(
            rd.from_arrow(tbl), n, iters=iters, checkpoint_dir=ck, resume=True
        )
        assert got["pr"].to_pylist() == want["pr"].to_pylist()
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
        # the final superstep committed; earlier ones were pruned
        latest = _latest_pr_checkpoint(ck)
        assert latest is not None and latest[0] == iters - 1

    def test_straggler_tmp_dirs_ignored(self, ray_session, tmp_path):
        """A writer killed MID-commit leaves only an *.tmp-* dir — the
        checkpoint scan must not resume from it."""
        import os

        from anansi_ray.functions.graph import _latest_pr_checkpoint

        ck = tmp_path / "pr_ck"
        (ck / "iter_0003.tmp-999").mkdir(parents=True)
        # a committed dir missing its manifest (rename landed, manifest
        # write did not — impossible with tmp-side manifest, but cheap to
        # guard) is also skipped
        (ck / "iter_0002").mkdir()
        assert _latest_pr_checkpoint(str(ck)) is None

    def test_resume_without_checkpoint_runs_fresh(self, ray_session, tmp_path):
        import ray.data as rd

        from anansi_ray.functions.graph import pagerank_integer

        n = 40
        tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
        got = pagerank_integer(
            rd.from_arrow(tbl),
            n,
            iters=2,
            checkpoint_dir=str(tmp_path / "none"),
            resume=True,
        )
        want = pagerank_integer(rd.from_arrow(tbl), n, iters=2)
        assert got["pr"].to_pylist() == want["pr"].to_pylist()


class TestFunnelKernel:
    def test_strict_ordering(self, ray_session, tmp_path):
        """click at the SAME timestamp as the first view does not count;
        a later one does — pinned against the SQL twin's strict >."""
        import duckdb

        from anansi_ray.pipelines.queries import SQL_EVENTS_FUNNEL, q_events_funnel

        ts = pa.array(
            np.array([100, 100, 200, 300, 50, 60], "datetime64[us]"),
            pa.timestamp("us"),
        )
        tbl = pa.table(
            {
                "event_id": pa.array(np.arange(6, dtype=np.int64)),
                "ts": ts,
                "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
                "event_type": pa.array(
                    ["view", "click", "click", "purchase", "click", "view"]
                ),
                "value": pa.array(np.zeros(6)),
                "props": pa.array(["{}"] * 6),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(tbl, tmp_path / "events.parquet")
        got = q_events_funnel(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("events", tbl)
        exp = con.sql(SQL_EVENTS_FUNNEL).df()
        # user 1: view@100, click@200 (not @100), purchase@300 -> all stages
        # user 2: click before any view -> view only
        assert got["users"].tolist() == [2, 1, 1]
        assert got["users"].tolist() == exp["users"].tolist()


class TestVarianceLimbs:
    def test_split_limb_exact_vs_python_int(self):
        """hi/lo recombination equals exact Python-int sum of squares for
        values near the int64-overflow regime."""
        rng = np.random.default_rng(3)
        cents = rng.integers(9_000_000, 10_500_000, 50_000).astype(np.int64)
        sq = cents * cents
        LIMB = 10**9
        hi = int(np.sum(sq // LIMB))
        lo = int(np.sum(sq % LIMB))
        assert hi * LIMB + lo == sum(int(c) * int(c) for c in cents.tolist())

    def test_variance_floor_div_twin(self):
        vals = [3, 5, 7, 7, 100]
        n = len(vals)
        s = sum(vals)
        ss = sum(v * v for v in vals)
        var_floor = (n * ss - s * s) // (n * n)
        mean = s / n
        import math

        assert var_floor == math.floor(
            sum((v - mean) ** 2 for v in vals) / n
        )


class TestCollectList:
    def test_binary_join_kernel(self, ray_session, tmp_path):
        import duckdb
        import pyarrow.parquet as pq

        from anansi_ray.pipelines.queries import (
            SQL_CUSTOMER_ORDER_LIST,
            q_customer_order_list,
        )

        rng = np.random.default_rng(11)
        n = 500
        tbl = pa.table(
            {
                "o_custkey": pa.array(rng.integers(0, 40, n), pa.int64()),
                "o_orderkey": pa.array(
                    rng.permutation(n).astype(np.int64), pa.int64()
                ),
            }
        )
        pq.write_table(tbl, tmp_path / "orders.parquet")
        got = q_customer_order_list(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("orders", tbl)
        exp = con.sql(SQL_CUSTOMER_ORDER_LIST).df()
        assert got["o_custkey"].tolist() == exp["o_custkey"].tolist()
        assert got["order_keys"].tolist() == exp["order_keys"].tolist()


class TestEventsLatest:
    def test_tiebreak_and_multiblock(self, ray_session, tmp_path):
        """Latest row per user with (ts DESC, event_id DESC) tie-break,
        exercised across MULTIPLE parquet files so the per-batch combiner
        and the hash-partition exchange both run — vs the DuckDB twin."""
        import duckdb
        import pyarrow.parquet as pq

        from anansi_ray.pipelines.queries import SQL_EVENTS_LATEST, q_events_latest

        rng = np.random.default_rng(7)
        n = 2000
        ts = pa.array(
            np.array(rng.integers(0, 50, n), "datetime64[us]"),  # heavy ties
            pa.timestamp("us"),
        )
        tbl = pa.table(
            {
                "event_id": pa.array(rng.permutation(n).astype(np.int64)),
                "ts": ts,
                "user_id": pa.array(rng.integers(0, 97, n), pa.int64()),
                "event_type": pa.array(
                    np.array(["view", "click", "purchase"])[
                        rng.integers(0, 3, n)
                    ]
                ),
                "value": pa.array(rng.normal(size=n)),
                "props": pa.array(["{}"] * n),
            }
        )
        d = tmp_path / "events.parquet"
        d.mkdir()
        pq.write_table(tbl.slice(0, 700), d / "a.parquet")
        pq.write_table(tbl.slice(700, 700), d / "b.parquet")
        pq.write_table(tbl.slice(1400), d / "c.parquet")
        got = q_events_latest(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("events", tbl)
        exp = con.sql(SQL_EVENTS_LATEST).df()
        assert got["user_id"].tolist() == exp["user_id"].tolist()
        assert got["event_id"].tolist() == exp["event_id"].tolist()
        assert got["ts"].tolist() == exp["ts"].tolist()
        assert got["value"].tolist() == exp["value"].tolist()


@pytest.mark.usefixtures("ray_session")
class TestHITS:
    def test_layout_invariance_and_hand_check(self):
        import ray.data as rd

        from anansi_ray.functions.graph import hits_integer

        n = 23
        docs = pa.table({"doc_id": pa.array(np.arange(n), pa.int64())})
        outs = []
        for nb in (1, 5):
            got = hits_integer(
                rd.from_arrow(docs).repartition(nb), n, rounds=2
            ).to_pandas()
            outs.append(got)
        assert outs[0].equals(outs[1])
        out = outs[0].set_index("doc_id")
        # hand-computed alternation on the deterministic graph
        edges = [(i, (2 * i + 1) % n) for i in range(n)] + [
            (i, (3 * i + 7) % n) for i in range(n)
        ]
        h = {i: 1 for i in range(n)}
        for _ in range(2):
            a = {i: 0 for i in range(n)}
            for s, d in edges:
                a[d] += h[s]
            h = {i: 0 for i in range(n)}
            for s, d in edges:
                h[s] += a[d]
        for i in range(n):
            assert out.loc[i, "hub"] == h[i]
            assert out.loc[i, "authority"] == a[i]
