"""Empty-input (0-row) sweep: EVERY ``queries()`` entry runs over a
ZERO-row slice of each sf table and — where a same-input DuckDB oracle
exists — must match it value-for-value.

One decade below the 7-row sweep (test_tiny_inputs.py): at 100-TB scale
an empty partition — an input shard whose filter matched nothing, a day
directory with no files — is not an edge case, it is a certainty, and a
query that only survives non-empty input will kill the whole job there.
The oracle also pins the SUBTLE empty semantics: a global aggregate
yields one all-NULL row (not zero rows), COUNT(*) yields 0 (not NULL),
a grouped aggregate yields zero rows.
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


def _empty_dir() -> str:
    d = tempfile.mkdtemp(prefix="emptysf_")
    for t in TABLES:
        tbl = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(tbl.slice(0, 0), os.path.join(d, f"{t}.parquet"))
    return d


@pytest.fixture(scope="module")
def empty_sf(ray_session):
    return _empty_dir()


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


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", _names())
def test_empty_input(name, empty_sf):
    import __ray_entry__ as entrymod

    fn = entrymod.queries()[name]
    got = _to_pandas(fn(empty_sf))
    assert isinstance(got, pd.DataFrame)

    oracles = entrymod.oracle_sql()
    if name not in oracles:
        return  # rows-only sketch: crash-freedom is the assertion
    if "anansi_oracle" in oracles[name]:
        # side-table twin pinned to the driver's sf0.01 inputs —
        # value-comparison on a different input dir is meaningless
        return
    got = _canon(got)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{empty_sf}/{t}.parquet'")
    exp = _canon(con.sql(oracles[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp), f"rows ray={len(got)} sql={len(exp)}"
    pd.testing.assert_frame_equal(
        got, exp, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )
