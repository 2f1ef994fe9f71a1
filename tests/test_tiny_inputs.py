"""Tiny-input robustness sweep: EVERY ``queries()`` entry runs over a
7-row slice of each sf table and — where an oracle exists — must still
match its DuckDB twin value-for-value.

This is the crash-class net for degenerate shapes the sf fixtures never
produce: k > n (clustering / knn / ntile), single-row groups, empty join
sides, strata smaller than the sample, quantile inputs shorter than the
grid.  A query that is only correct above some input size is a latent
100-TB bug (at scale, some PARTITION is always tiny).
"""
from __future__ import annotations

import os
import tempfile

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
N = 7


def _slice_dir() -> str:
    d = tempfile.mkdtemp(prefix="tinysf_")
    for t in TABLES:
        tbl = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(tbl.slice(0, N), os.path.join(d, f"{t}.parquet"))
    return d


@pytest.fixture(scope="module")
def tiny_sf(ray_session):
    return _slice_dir()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), ignore_index=True)


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _names():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    return sorted(entrymod.queries())


@pytest.mark.parametrize("name", _names())
def test_tiny_input(name, tiny_sf):
    import __ray_entry__ as entrymod

    fn = entrymod.queries()[name]
    got = _canon(_to_pandas(fn(tiny_sf)))

    oracles = entrymod.oracle_sql()
    if name not in oracles:
        return  # rows-only sketch: crash-freedom is the assertion
    if "anansi_oracle" in oracles[name]:
        # side-table twin pinned to the driver's sf0.01 inputs (see
        # queries.ensure_oracle_artifacts) — value-comparison on a
        # different input dir is meaningless; crash-freedom only.
        return
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{tiny_sf}/{t}.parquet'"
        )
    exp = _canon(con.sql(oracles[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp), f"rows ray={len(got)} sql={len(exp)}"
    pd.testing.assert_frame_equal(
        got, exp, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )
