"""coarse_agg — the repo-wide near-unique-key aggregation primitive.

Equality is checked against Ray's own ``groupby().aggregate()`` (the
sort-based reference semantics) on integer and string keys, all four ops,
including negative keys, single-row groups, and empty input.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from anansi_ray.arrowds import coarse_agg, stable_pandas


def _ref(ds, key, aggs):
    ray_aggs = []
    for name, (op, col) in aggs.items():
        if op == "sum":
            ray_aggs.append(Sum(col, alias_name=name))
        elif op == "min":
            ray_aggs.append(Min(col, alias_name=name))
        elif op == "max":
            ray_aggs.append(Max(col, alias_name=name))
        else:
            ray_aggs.append(Count(alias_name=name))
    df = ds.groupby(key).aggregate(*ray_aggs).to_pandas()
    return df.sort_values(key).reset_index(drop=True)


def _got(ds, key, aggs, **kw):
    df = coarse_agg(ds, key, aggs, **kw).to_pandas()
    return df.sort_values(key).reset_index(drop=True)[
        [key, *aggs.keys()]
    ]


def test_int_key_all_ops(ray_session):
    rng = np.random.default_rng(7)
    n = 20_000
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(-5_000, 5_000, n), pa.int64()),
            "v": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "f": pa.array(rng.normal(size=n).round(3), pa.float64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(8)
    aggs = {
        "s": ("sum", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
        "n": ("count", "v"),
        "fs": ("sum", "f"),
    }
    got = _got(ds, "k", aggs)
    ref = _ref(ds, "k", aggs)
    pd.testing.assert_series_equal(got["k"], ref["k"], check_names=False)
    for c in ("s", "lo", "hi", "n"):
        assert (got[c].to_numpy() == ref[c].to_numpy()).all(), c
    assert np.allclose(got["fs"].to_numpy(), ref["fs"].to_numpy())


def test_string_key(ray_session):
    rng = np.random.default_rng(11)
    keys = [f"tok{int(i)}" for i in rng.integers(0, 3_000, 10_000)]
    tbl = pa.table(
        {
            "token": pa.array(keys, pa.string()),
            "df": pa.array(rng.integers(1, 5, 10_000), pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(6)
    aggs = {"df_sum": ("sum", "df"), "n": ("count", "df")}
    got = _got(ds, "token", aggs)
    ref = _ref(ds, "token", aggs)
    assert got["token"].tolist() == ref["token"].tolist()
    assert (got["df_sum"].to_numpy() == ref["df_sum"].to_numpy()).all()
    assert (got["n"].to_numpy() == ref["n"].to_numpy()).all()


def test_composite_key(ray_session):
    rng = np.random.default_rng(3)
    n = 15_000
    tbl = pa.table(
        {
            "lang": pa.array(
                [f"l{int(i)}" for i in rng.integers(0, 5, n)], pa.string()
            ),
            "tok": pa.array(rng.integers(0, 2_000, n), pa.int64()),
            "c": pa.array(rng.integers(1, 9, n), pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(7)
    aggs = {"cnt": ("sum", "c"), "n": ("count", "c"), "mx": ("max", "c")}
    got = (
        coarse_agg(ds, ["lang", "tok"], aggs)
        .to_pandas()
        .sort_values(["lang", "tok"])
        .reset_index(drop=True)
    )
    ref = _ref(ds, ["lang", "tok"], aggs)
    ref = ref.sort_values(["lang", "tok"]).reset_index(drop=True)
    assert got["lang"].tolist() == ref["lang"].tolist()
    assert (got["tok"].to_numpy() == ref["tok"].to_numpy()).all()
    for c in ("cnt", "n", "mx"):
        assert (got[c].to_numpy() == ref[c].to_numpy()).all(), c


def test_empty_input_keeps_schema(ray_session):
    tbl = pa.table(
        {"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
    )
    ds = rd.from_arrow(tbl)
    out_ds = coarse_agg(ds, "k", {"s": ("sum", "v")})
    # the Dataset keeps its typed schema; the plain to_pandas() 0-column
    # collapse on all-empty results is the known Ray behavior stable_pandas
    # exists for
    assert [f.name for f in out_ds.schema().base_schema] == ["k", "s"]
    out = stable_pandas(out_ds)
    assert set(("k", "s")) <= set(out.columns)
    assert len(out) == 0


def test_unknown_op_raises(ray_session):
    ds = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        coarse_agg(ds, "k", {"s": ("avg", "k")})
