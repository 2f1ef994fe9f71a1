"""Round-4 operator edge semantics: RAG chunking, inverted index, cohort
retention, EXCEPT churn, Z-order layout, banded fuzzy matching — each pinned
against a per-row loop twin and/or its DuckDB oracle on hand-built tables.
"""
from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anansi_ray.functions.text import CHUNK_S, CHUNK_W, chunk_documents_batch

SF0001 = "/root/testdata/sf0.001"


def _docs(tmp_path, texts, row_group_size=None):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet", row_group_size=row_group_size)
    return tbl


class TestChunkKernel:
    def _reference(self, doc_id, text):
        """Per-row loop twin of chunk_documents_batch."""
        t = text or ""
        n = len(t)
        rows = []
        i = 0
        while True:
            chunk = t[i * CHUNK_S : i * CHUNK_S + CHUNK_W]
            rows.append(
                (doc_id, i, i * CHUNK_S + 1, len(chunk), sum(ord(c) for c in chunk))
            )
            # stop once the chunk just emitted reached the document end
            if i * CHUNK_S + CHUNK_W >= n or n <= CHUNK_W:
                break
            i += 1
        return rows

    @pytest.mark.parametrize(
        "texts",
        [
            ["", "x", "a" * CHUNK_W, "b" * (CHUNK_W + 1), "c" * (2 * CHUNK_S + CHUNK_W)],
            ["naïve café — ünïcode ✓" * 30, "plain ascii " * 40],
            [None, "after a null"],
        ],
    )
    def test_vs_row_loop(self, texts):
        b = pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        got = chunk_documents_batch(b).to_pylist()
        exp = [
            dict(zip(("doc_id", "chunk_idx", "start_pos", "chunk_len", "code_sum"), r))
            for d, t in zip(range(1, len(texts) + 1), texts)
            for r in self._reference(d, t)
        ]
        assert got == exp

    def test_overlap_invariant(self):
        """Consecutive chunks overlap by exactly W - S chars and cover the
        document with no gaps."""
        text = "q" * 1000
        b = pa.table({"doc_id": pa.array([1], pa.int64()), "text": [text]})
        rows = chunk_documents_batch(b).to_pylist()
        for prev, cur in zip(rows, rows[1:]):
            prev_end = prev["start_pos"] + prev["chunk_len"] - 1
            assert cur["start_pos"] == prev["start_pos"] + CHUNK_S
            assert prev_end >= cur["start_pos"] - 1  # no gap
        last = rows[-1]
        assert last["start_pos"] + last["chunk_len"] - 1 == len(text)

    def test_vs_duckdb_multiblock(self, ray_session, tmp_path):
        from anansi_ray.pipelines.queries import SQL_DOC_CHUNKS, q_doc_chunks

        texts = ["word %d " % i * (i + 1) for i in range(40)]
        tbl = _docs(tmp_path, texts, row_group_size=7)
        got = q_doc_chunks(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("documents", tbl)
        exp = con.sql(SQL_DOC_CHUNKS).df()
        assert got.reset_index(drop=True).equals(exp)


class TestInvertedIndex:
    def test_postings_vs_duckdb(self, ray_session, tmp_path):
        from anansi_ray.pipelines.queries import SQL_INVERTED_INDEX, q_inverted_index

        texts = [
            "alpha beta gamma",
            "beta gamma delta",
            "gamma delta epsilon",
            "zeta only-once",
            "Alpha BETA punct, punct; punct!",
        ] * 3  # duplicates across row groups exercise the exchange merge
        tbl = _docs(tmp_path, texts, row_group_size=4)
        got = q_inverted_index(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("documents", tbl)
        exp = con.sql(SQL_INVERTED_INDEX).df()
        assert got.reset_index(drop=True).equals(exp)
        # df >= 2 filter: singleton tokens are absent
        assert "epsilon" in set(got["token"])
        assert (got["df"] >= 2).all()

    def test_postings_sorted(self, ray_session, tmp_path):
        from anansi_ray.pipelines.queries import q_inverted_index

        _docs(tmp_path, ["tok"] * 9, row_group_size=2)
        got = q_inverted_index(str(tmp_path)).to_pandas()
        assert got["postings"].tolist() == ["1,2,3,4,5,6,7,8,9"]


def _events_tbl(tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type, value)."""
    eid, ts, uid, et, val = zip(*rows)
    tbl = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(np.array(ts, "datetime64[us]"), pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array(np.array(val, np.float64)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet", row_group_size=3)
    return tbl


DAY = 86_400_000_000


class TestCohortRetention:
    def test_triangle_vs_duckdb(self, ray_session, tmp_path):
        """User 1: days 0,1,3 (cohort 0); user 2: days 1,1,1 (dup pairs
        across row groups — dedup path); user 3: day 3 only."""
        from anansi_ray.pipelines.queries import (
            SQL_COHORT_RETENTION,
            q_cohort_retention,
        )

        rows = [
            (0, 0 * DAY + 5, 1, "view", 0.0),
            (1, 1 * DAY + 5, 1, "view", 0.0),
            (2, 3 * DAY + 5, 1, "view", 0.0),
            (3, 1 * DAY + 1, 2, "view", 0.0),
            (4, 1 * DAY + 2, 2, "view", 0.0),
            (5, 1 * DAY + 3, 2, "view", 0.0),
            (6, 3 * DAY + 9, 3, "view", 0.0),
        ]
        tbl = _events_tbl(tmp_path, rows)
        got = q_cohort_retention(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("events", tbl)
        exp = con.sql(SQL_COHORT_RETENTION).df()
        assert got.reset_index(drop=True).equals(exp)
        tri = {(r.cohort_day, r.day_offset): r.n_users for r in got.itertuples()}
        assert tri[(0, 0)] == 1 and tri[(0, 1)] == 1 and tri[(0, 3)] == 1
        assert tri[(1, 0)] == 1  # user 2 collapses to one (cohort, 0) row
        assert tri[(3, 0)] == 1  # user 3


class TestUsersChurn:
    def test_milestone_except(self, ray_session, tmp_path):
        from anansi_ray.pipelines.queries import SQL_USERS_CHURN, q_users_churn

        rows = [
            (0, 10, 1, "purchase", 1.23),   # no milestone -> churn
            (1, 20, 2, "purchase", 0.97),   # 97 cents -> milestone
            (2, 30, 2, "purchase", 1.00),
            (3, 40, 3, "view", 0.97),       # 97 cents but not a purchase
            (4, 50, 4, "purchase", 1.94),   # 194 = 2*97 -> milestone
        ]
        tbl = _events_tbl(tmp_path, rows)
        got = q_users_churn(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("events", tbl)
        exp = con.sql(SQL_USERS_CHURN).df()
        assert got["user_id"].tolist() == [1]
        assert got.reset_index(drop=True).equals(exp)

    def test_empty_keeps_schema(self, ray_session, tmp_path):
        from anansi_ray.pipelines.queries import q_users_churn

        _events_tbl(tmp_path, [(0, 10, 1, "purchase", 0.97)])
        got = q_users_churn(str(tmp_path))
        assert got.num_rows == 0
        assert got.schema.field("user_id").type == pa.int64()


class TestZorder:
    def test_morton_vs_row_loop(self):
        from anansi_ray.pipelines.queries import _morton16

        rng = np.random.default_rng(7)
        x = rng.integers(0, 256, 500).astype(np.int64)
        y = rng.integers(0, 256, 500).astype(np.int64)
        got = _morton16(x, y)

        def ref(a, b):
            m = 0
            for i in range(8):
                m |= ((a >> i) & 1) << (2 * i)
                m |= ((b >> i) & 1) << (2 * i + 1)
            return m

        assert got.tolist() == [ref(int(a), int(b)) for a, b in zip(x, y)]

    def test_cells_bound_rectangles(self, ray_session):
        """Every Z-cell's bounding box stays inside one aligned 32x32 tile
        — the two-column pruning property the layout exists for."""
        from anansi_ray.pipelines.queries import SQL_ZORDER_LAYOUT, q_zorder_layout

        got = q_zorder_layout(SF0001).to_pandas()
        assert (got["min_x"] // 32 == got["max_x"] // 32).all()
        assert (got["min_y"] // 32 == got["max_y"] // 32).all()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{SF0001}/lineitem.parquet')"
        )
        exp = con.sql(SQL_ZORDER_LAYOUT).df()
        assert got.reset_index(drop=True).equals(exp)


class TestFuzzyMatch:
    def test_dp_vs_reference_levenshtein(self):
        """The pair-vectorized DP equals a textbook per-pair Levenshtein on
        random equal-length strings (including distances > the threshold)."""

        def ref_lev(a, b):
            la, lb = len(a), len(b)
            prev = list(range(lb + 1))
            for i in range(1, la + 1):
                cur = [i] + [0] * lb
                for j in range(1, lb + 1):
                    cur[j] = min(
                        cur[j - 1] + 1,
                        prev[j] + 1,
                        prev[j - 1] + (a[i - 1] != b[j - 1]),
                    )
                prev = cur
            return prev[lb]

        rng = np.random.default_rng(11)
        names = [
            "".join(rng.choice(list("abcde"), size=8)) for _ in range(30)
        ]
        # run the same DP the query uses, via a fake part table
        import pandas as pd
        import pyarrow.parquet as pqq
        import tempfile, os

        from anansi_ray.pipelines.queries import q_fuzzy_name_match

        with tempfile.TemporaryDirectory() as d:
            tbl = pa.table(
                {
                    "p_partkey": pa.array(range(len(names)), pa.int64()),
                    "p_name": pa.array(names, pa.string()),
                }
            )
            pqq.write_table(tbl, os.path.join(d, "part.parquet"))
            got = q_fuzzy_name_match(d).to_pandas()
        uniq = sorted(set(names))
        exp = [
            (a, b, ref_lev(a, b))
            for i, a in enumerate(uniq)
            for b in uniq[i + 1 :]
            if len(a) == len(b) and ref_lev(a, b) <= 2
        ]
        assert [tuple(r) for r in got.itertuples(index=False)] == exp

    def test_vs_duckdb_sf0001(self, ray_session):
        from anansi_ray.pipelines.queries import (
            SQL_FUZZY_NAME_MATCH,
            q_fuzzy_name_match,
        )

        got = q_fuzzy_name_match(SF0001).to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF0001}/part.parquet')"
        )
        exp = con.sql(SQL_FUZZY_NAME_MATCH).df()
        assert got.reset_index(drop=True).equals(exp)


class TestAttribution:
    def test_fill_does_not_leak_across_users(self, ray_session, tmp_path):
        """User 7's purchase is their first event; user 3's preceding view
        must NOT fill it (the per-user run reset).  Ties on ts order by
        event_id."""
        from anansi_ray.pipelines.queries import (
            SQL_PURCHASE_ATTRIBUTION,
            q_purchase_attribution,
        )

        rows = [
            (0, 100, 3, "view", 0.0),
            (1, 200, 3, "purchase", 1.0),
            (2, 150, 7, "purchase", 1.0),   # user 7's first event
            (3, 300, 7, "click", 0.0),
            (4, 300, 7, "purchase", 1.0),   # tie ts with event 3 -> click wins
            (5, 400, 3, "purchase", 1.0),   # view still latest non-purchase
        ]
        tbl = _events_tbl(tmp_path, rows)
        got = q_purchase_attribution(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("events", tbl)
        exp = con.sql(SQL_PURCHASE_ATTRIBUTION).df()
        assert got["event_id"].tolist() == [1, 2, 4, 5]
        assert got["touch_type"].tolist() == ["view", None, "click", "view"]
        assert got.reset_index(drop=True).equals(exp)


class TestSnapshotDiff:
    def test_closed_form_and_oracle(self, ray_session):
        import pyarrow.parquet as pqq

        from anansi_ray.pipelines.queries import SQL_SNAPSHOT_DIFF, q_snapshot_diff

        got = q_snapshot_diff(SF0001).to_pandas()
        ids = pqq.read_table(
            SF0001 + "/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_pylist()
        removed = {i for i in ids if i % 11 == 0}
        changed = {i for i in ids if i % 7 == 0 and i % 11 != 0}
        added = {i + 10_000_000 for i in ids if i % 13 == 0}
        by = {c: set(g["doc_id"]) for c, g in got.groupby("change")}
        assert by.get("removed", set()) == removed
        assert by.get("changed", set()) == changed
        assert by.get("added", set()) == added
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF0001}/documents.parquet')"
        )
        exp = con.sql(SQL_SNAPSHOT_DIFF).df()
        assert got.reset_index(drop=True).equals(exp)


class TestSkyline:
    def test_kernel_vs_brute_force(self):
        from anansi_ray.pipelines.queries import _skyline_kernel

        rng = np.random.default_rng(3)
        for trial, (x, y) in enumerate(
            [
                (rng.integers(0, 40, 300), rng.integers(0, 40, 300)),  # dups likely
                (np.arange(100), 99 - np.arange(100)),  # anti-correlated: all survive
                (np.full(50, 7), rng.integers(0, 10, 50)),  # one x column
            ]
        ):
            x = x.astype(np.int64); y = y.astype(np.int64)
            k = np.arange(len(x), dtype=np.int64)
            keep, order = _skyline_kernel(x, y, k)
            got = set(k[order][keep].tolist())
            exp = set()
            for i in range(len(x)):
                dominated = any(
                    (x[j] <= x[i]) and (y[j] <= y[i]) and (x[j] < x[i] or y[j] < y[i])
                    for j in range(len(x))
                )
                if not dominated:
                    exp.add(i)
            assert got == exp, f"trial {trial}"

    def test_composability_and_oracle(self, ray_session):
        """skyline(union of per-block skylines) == global skyline — the
        property the two-pass distributed shape relies on — and the result
        equals the DuckDB window twin."""
        from anansi_ray.pipelines.queries import SQL_ORDERS_SKYLINE, q_orders_skyline

        got = q_orders_skyline(SF0001).to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{SF0001}/orders.parquet')"
        )
        exp = con.sql(SQL_ORDERS_SKYLINE).df()
        assert got.reset_index(drop=True).equals(exp)
        # every skyline row is actually non-dominated in the full table
        full = con.sql(
            "SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents, "
            "CAST(floor(epoch_us(o_orderdate)/86400000000) AS BIGINT) AS day "
            "FROM orders"
        ).df()
        for r in got.itertuples():
            dom = (
                (full["cents"] <= r.cents)
                & (full["day"] <= r.day)
                & ((full["cents"] < r.cents) | (full["day"] < r.day))
            )
            assert not dom.any()


class TestRegression:
    def test_negative_slope_truncating_div(self, ray_session, tmp_path):
        """Values falling over time -> negative slope; the Ray side must
        truncate toward zero exactly like DuckDB's `//`."""
        from anansi_ray.pipelines.queries import (
            SQL_EVENTS_REGRESSION,
            q_events_regression,
        )

        rows = []
        for i in range(10):  # y = 1000 - 3*x(min) cents, exact line
            rows.append((i, i * 60_000_000, 1, "view", (1000 - 3 * i) / 100.0))
        for i in range(7):   # noisy rising series, exercises remainders
            rows.append((100 + i, i * 90_000_000, 2, "click", (50 + 17 * i + (i % 3)) / 100.0))
        tbl = _events_tbl(tmp_path, rows)
        got = q_events_regression(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.register("events", tbl)
        exp = con.sql(SQL_EVENTS_REGRESSION).df()
        assert got["slope_e9"].tolist() == exp["slope_e9"].tolist()
        assert got["intercept_e6"].tolist() == exp["intercept_e6"].tolist()
        view = got[got["event_type"] == "view"].iloc[0]
        assert view["slope_e9"] == -3_000_000_000  # exactly -3 cents/min
        assert view["intercept_e6"] == 1_000_000_000  # exactly 1000 cents
