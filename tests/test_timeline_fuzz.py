"""Tie-heavy fuzz for the timeline-adjacency kernels (event_transitions /
user_twap / user_state_intervals / user_streaks): random small frames with
DELIBERATELY colliding timestamps and users, engine output compared to a
DuckDB twin on a temp table.  The kernels' correctness rests on the
(ts, event_id) total order and same-user adjacency masks — exactly what
tie storms stress.
"""
from __future__ import annotations

import os
import tempfile

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from anansi_ray.pipelines.queries import (
    QUERIES,
    q_event_transitions,
    q_user_state_intervals,
    q_user_streaks,
    q_user_twap,
)


def _mk_events(n, users, ts_choices, seed):
    rng = np.random.RandomState(seed)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                rng.choice(ts_choices, n) * 1_000_000, unit="us"
            ),
            "user_id": rng.choice(users, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": np.round(rng.rand(n) * 10, 3),
            "props": ["{}"] * n,
        }
    )
    return df


def _write_sf(df) -> str:
    d = tempfile.mkdtemp(prefix="tlfuzz_")
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        os.path.join(d, "events.parquet"),
    )
    return d


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    return con.execute(sql).fetchdf()


def _compare(name, q_fn, sf_dir):
    got = q_fn(sf_dir).to_pandas().reset_index(drop=True)
    want = _oracle(sf_dir, QUERIES[name][1]).reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(
        {c: got[c].dtype for c in sorted(want.columns)}
    )
    # row order: sort both by all columns (the driver sorts before hashing)
    cols = sorted(got.columns)
    got = got.sort_values(cols).reset_index(drop=True)
    want = want.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# small pools force heavy collisions: few users, few distinct timestamps
_seeds = st.integers(min_value=0, max_value=10_000)


class TestTimelineFuzz:
    @settings(max_examples=3, deadline=None)
    @given(_seeds)
    def test_event_transitions(self, seed):
        df = _mk_events(60, [1, 2, 3], [1000, 2000, 2000 + 86400], seed)
        sf = _write_sf(df)
        _compare("event_transitions", q_event_transitions, sf)

    @settings(max_examples=3, deadline=None)
    @given(_seeds)
    def test_user_twap(self, seed):
        df = _mk_events(60, [1, 2], [5_000, 5_000, 90_000, 200_000], seed)
        sf = _write_sf(df)
        _compare("user_twap", q_user_twap, sf)

    @settings(max_examples=3, deadline=None)
    @given(_seeds)
    def test_user_state_intervals(self, seed):
        df = _mk_events(50, [7, 8, 9], [0, 3600, 3600, 7200], seed)
        sf = _write_sf(df)
        _compare("user_state_intervals", q_user_state_intervals, sf)

    @settings(max_examples=3, deadline=None)
    @given(_seeds)
    def test_user_streaks(self, seed):
        day = 86_400
        df = _mk_events(
            50, [1, 2], [0, day, day, 2 * day, 4 * day, 5 * day], seed
        )
        sf = _write_sf(df)
        _compare("user_streaks", q_user_streaks, sf)
