"""Self-check harness mimicking the driver's correctness gate: run every
``queries()`` entry at a given sf_dir AND its ``oracle_sql()`` in DuckDB,
compare row count + schema + order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # oracle_sql() builds/points the artifacts for the DRIVER's default
    # sf0.01; data-dependent twins (minhash groups, logreg, ALS, BPE, …)
    # must compare against artifacts derived from THE DATA BEING QUERIED,
    # so build this sf's artifacts and rewrite the artifact paths in the
    # SQL to the per-sf REAL directory — immune to any concurrent process
    # re-pointing the shared ORACLE_DIR symlink mid-sweep
    from anansi_ray.pipelines.queries import ORACLE_DIR, ensure_oracle_artifacts

    real_dir = ensure_oracle_artifacts(sf_dir)
    oracles = {
        name: sql.replace(ORACLE_DIR + "/", real_dir + "/")
        for name, sql in oracles.items()
    }
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got_raw = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray side raised {type(e).__name__}: {e}")
            failures += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got_raw)} (rows-only, no oracle) [{el:.1f}s]")
            if len(got_raw) == 0:
                print(f"WARN {name}: zero rows")
            continue
        got = canon(got_raw)
        try:
            exp = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {e}")
            failures += 1
            continue
        status = []
        if list(got.columns) != list(exp.columns):
            status.append(f"schema ray={list(got.columns)} sql={list(exp.columns)}")
        elif len(got) != len(exp):
            status.append(f"rows ray={len(got)} sql={len(exp)}")
        else:
            try:
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
                )
            except AssertionError as e:
                status.append("values: " + str(e).split("\n")[0])
                # show first diff
                neq = (got != exp) & ~(got.isna() & exp.isna())
                bad = neq.any(axis=1)
                if bad.any():
                    i = bad.idxmax()
                    status.append(
                        f" first diff row {i}: ray={got.loc[i].to_dict()} sql={exp.loc[i].to_dict()}"
                    )
        if status:
            print(f"FAIL {name}: " + "; ".join(status))
            failures += 1
        else:
            print(f"ok   {name}: rows={len(got)} MATCH [{el:.1f}s]")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
