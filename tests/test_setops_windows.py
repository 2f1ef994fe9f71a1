"""rank/dense_rank, per-key mode, INTERSECT retention, CUBE and
co-occurrence pair operators: edge semantics pinned against the DuckDB
twins on hand-built tables (ties, boundaries, layout independence)."""
from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF0001 = "/root/testdata/sf0.001"


def _events(tmp_path, rows):
    """rows: list of (event_id, ts_us, user_id, event_type)."""
    eid, ts, uid, et = zip(*rows)
    tbl = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(np.array(ts, "datetime64[us]"), pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array(np.zeros(len(rows))),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return tbl


class TestUserRank:
    def test_tie_semantics_vs_duckdb(self, ray_session, tmp_path):
        """Three users tie at n=2 within one type: rank skips (1,1,1,4),
        dense_rank does not (1,1,1,2)."""
        from anansi_ray.pipelines.queries import (
            SQL_EVENTS_USER_RANK,
            q_events_user_rank,
        )

        rows = []
        i = 0
        for uid, n in [(1, 2), (2, 2), (3, 2), (4, 1)]:
            for _ in range(n):
                rows.append((i, 1000 + i, uid, "view"))
                i += 1
        tbl = _events(tmp_path, rows)
        got = q_events_user_rank(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("events", tbl)
        exp = con.sql(SQL_EVENTS_USER_RANK).df()
        assert got["rnk"].tolist() == [1, 1, 1, 4]
        assert got["drnk"].tolist() == [1, 1, 1, 2]
        assert got["rnk"].tolist() == exp["rnk"].tolist()
        assert got["drnk"].tolist() == exp["drnk"].tolist()


class TestMode:
    def test_lexicographic_tiebreak(self, ray_session, tmp_path):
        """user 1 ties click/view at 2 each -> 'click' (lexicographically
        smallest) wins, matching the SQL twin's ORDER BY n DESC, type ASC."""
        from anansi_ray.pipelines.queries import SQL_EVENTS_MODE, q_events_mode

        rows = [
            (0, 100, 1, "view"),
            (1, 200, 1, "click"),
            (2, 300, 1, "view"),
            (3, 400, 1, "click"),
            (4, 500, 2, "purchase"),
        ]
        tbl = _events(tmp_path, rows)
        got = q_events_mode(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("events", tbl)
        exp = con.sql(SQL_EVENTS_MODE).df()
        assert got["top_type"].tolist() == ["click", "purchase"]
        assert got["top_type"].tolist() == exp["top_type"].tolist()
        assert got["n"].tolist() == exp["n"].tolist()

    def test_cross_batch_partial_merge(self, ray_session, tmp_path):
        """Counts for the same (user, type) arriving from different batches
        must merge before the argmax: 64 single-row fragments."""
        from anansi_ray.pipelines.queries import q_events_mode

        rows = [(i, 1000 + i, 7, "view" if i < 40 else "click") for i in range(64)]
        _events(tmp_path, rows)
        got = q_events_mode(str(tmp_path)).to_pandas()
        assert got["top_type"].tolist() == ["view"]
        assert got["n"].tolist() == [40]


class TestRetention:
    def test_half_boundary_and_intersect(self, ray_session, tmp_path):
        """2*ts == min+max lands in the FIRST half (<=); only users with
        events strictly on both sides survive."""
        from anansi_ray.pipelines.queries import (
            SQL_USERS_RETENTION,
            q_users_retention,
        )

        # range [0, 1000]; midpoint 500 is first-half
        rows = [
            (0, 0, 1, "view"),      # u1: first only
            (1, 1000, 2, "view"),   # u2: second only
            (2, 0, 3, "view"),      # u3: both
            (3, 900, 3, "view"),
            (4, 500, 4, "view"),    # u4: boundary -> first half only
            (5, 499, 5, "view"),    # u5: both (501 > 500)
            (6, 501, 5, "view"),
        ]
        tbl = _events(tmp_path, rows)
        got = q_users_retention(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("events", tbl)
        exp = con.sql(SQL_USERS_RETENTION).df()
        assert got["user_id"].tolist() == [3, 5]
        assert got["user_id"].tolist() == exp["user_id"].tolist()


class TestCube:
    def test_cube_vs_duckdb_sf0001(self, ray_session):
        from anansi_ray.pipelines.queries import SQL_LINEITEM_CUBE, q_lineitem_cube

        got = q_lineitem_cube(SF0001).to_pandas()
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW lineitem AS SELECT * FROM '{SF0001}/lineitem.parquet'"
        )
        exp = con.sql(SQL_LINEITEM_CUBE).df()
        assert got["l_returnflag"].tolist() == exp["l_returnflag"].tolist()
        assert got["l_linestatus"].tolist() == exp["l_linestatus"].tolist()
        assert got["sum_qty"].tolist() == pytest.approx(exp["sum_qty"].tolist())
        assert got["count_order"].tolist() == exp["count_order"].tolist()


class TestUnpivot:
    def test_melt_matches_unpivot_twin(self, ray_session, tmp_path):
        """wide→long melt: 2 users × 10 metrics, counts and rounded value
        sums interleave exactly as DuckDB's UNPIVOT emits them."""
        from anansi_ray.pipelines.queries import (
            SQL_EVENTS_UNPIVOT,
            q_events_unpivot,
        )

        # all five catalog types must appear somewhere: the Ray side
        # discovers the type set from data, the SQL twin hardcodes it
        rows = [
            (0, 100, 1, "view"),
            (1, 200, 1, "click"),
            (2, 300, 2, "purchase"),
            (3, 400, 2, "signup"),
            (4, 500, 2, "error"),
        ]
        tbl = _events(tmp_path, rows)
        got = q_events_unpivot(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("events", tbl)
        exp = con.sql(SQL_EVENTS_UNPIVOT).df()
        assert len(got) == 2 * 10
        assert got["metric"].tolist() == exp["metric"].tolist()
        assert got["v"].tolist() == pytest.approx(exp["v"].tolist())


class TestFullOuter:
    def test_one_sided_days_survive(self, ray_session, tmp_path):
        """days with only orders or only events appear with 0 on the other
        side — the rows an inner join would drop."""
        from anansi_ray.pipelines.queries import (
            SQL_DAILY_ACTIVITY,
            q_daily_activity,
        )

        DAY = 86_400_000_000
        _events(tmp_path, [(0, 0 * DAY, 1, "view"), (1, 2 * DAY, 1, "view")])
        orders = pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_custkey": pa.array([1, 1], pa.int64()),
                "o_orderstatus": pa.array(["O", "O"]),
                "o_totalprice": pa.array([1.0, 2.0]),
                "o_orderdate": pa.array(
                    np.array([1 * DAY, 2 * DAY], "datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * 2),
            }
        )
        pq.write_table(orders, tmp_path / "orders.parquet")
        got = q_daily_activity(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
        )
        con.register("orders", orders)
        exp = con.sql(SQL_DAILY_ACTIVITY).df()
        assert got["day"].tolist() == [0, 1, 2]
        assert got["n_orders"].tolist() == [0, 1, 1]
        assert got["n_events"].tolist() == [1, 0, 1]
        for c in ("day", "n_orders", "n_events"):
            assert got[c].tolist() == exp[c].tolist()


class TestSeededFuzz:
    @pytest.mark.parametrize("seed", [11, 23, 57])
    def test_rank_mode_pairs_vs_duckdb_random(self, ray_session, tmp_path, seed):
        """Randomized events (heavy ties by design: few types, few users)
        through the full distributed path vs all three DuckDB twins."""
        from anansi_ray.pipelines.queries import (
            SQL_EVENT_TYPE_PAIRS,
            SQL_EVENTS_MODE,
            SQL_EVENTS_USER_RANK,
            q_event_type_pairs,
            q_events_mode,
            q_events_user_rank,
        )

        rng = np.random.default_rng(seed)
        n = 400
        types = ["click", "error", "purchase", "signup", "view"]
        rows = [
            (
                i,
                int(rng.integers(0, 10_000)),
                int(rng.integers(1, 12)),
                types[int(rng.integers(0, 5))],
            )
            for i in range(n)
        ]
        tbl = _events(tmp_path, rows)
        con = duckdb.connect()
        con.register("events", tbl)
        for fn, sql in (
            (q_events_user_rank, SQL_EVENTS_USER_RANK),
            (q_events_mode, SQL_EVENTS_MODE),
            (q_event_type_pairs, SQL_EVENT_TYPE_PAIRS),
        ):
            got = fn(str(tmp_path)).to_pandas()
            exp = con.sql(sql).df()
            assert len(got) == len(exp), fn.__name__
            for c in got.columns:
                assert got[c].tolist() == exp[c].tolist(), (fn.__name__, c)


class TestNtile:
    @pytest.mark.parametrize("n", [2, 7, 8])
    def test_uneven_buckets_vs_duckdb(self, ray_session, tmp_path, n):
        """n=7: first 3 quartiles get 2 rows, last gets 1 (first-buckets-
        bigger rule); n=2 < k: one row per tile 1..n."""
        from anansi_ray.pipelines.queries import SQL_ORDERS_NTILE, q_orders_ntile

        orders = pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(np.zeros(n, np.int64)),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array((np.arange(n) * 10.0 + 1.0)),
                "o_orderdate": pa.array(
                    np.zeros(n, "datetime64[us]"), pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        )
        pq.write_table(orders, tmp_path / "orders.parquet")
        got = q_orders_ntile(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("orders", orders)
        exp = con.sql(SQL_ORDERS_NTILE).df()
        assert got["quartile"].tolist() == exp["quartile"].tolist()


class TestTypePairs:
    def test_pairs_vs_duckdb_and_layout(self, ray_session, tmp_path):
        """Pair counts match the DISTINCT self-join twin; duplicate events
        of the same (user, type) count the user once."""
        from anansi_ray.pipelines.queries import (
            SQL_EVENT_TYPE_PAIRS,
            q_event_type_pairs,
        )

        rows = [
            (0, 1, 1, "view"),
            (1, 2, 1, "view"),      # dup (1, view)
            (2, 3, 1, "click"),
            (3, 4, 2, "click"),
            (4, 5, 2, "view"),
            (5, 6, 2, "purchase"),
            (6, 7, 3, "view"),      # singleton user: no pairs
        ]
        tbl = _events(tmp_path, rows)
        got = q_event_type_pairs(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("events", tbl)
        exp = con.sql(SQL_EVENT_TYPE_PAIRS).df()
        assert got["type_a"].tolist() == exp["type_a"].tolist()
        assert got["type_b"].tolist() == exp["type_b"].tolist()
        assert got["n_users"].tolist() == exp["n_users"].tolist()
        # (click, view) seen for users 1 and 2
        m = got.set_index(["type_a", "type_b"])["n_users"]
        assert m[("click", "view")] == 2
