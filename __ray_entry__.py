"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline (the Ray-Data-native Anansi
round loop over the deterministic synthetic LOD web) and returns the
interleaved text+media documents table; ``queries()`` exposes every
implemented operator from SURVEY.md §2 plus the training-data extensions;
``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible entry.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from anansi_ray.pipelines.queries import QUERIES  # noqa: E402


def entry() -> Any:
    """Flagship: crawl the deterministic synthetic LOD web end-to-end
    (seeds → canonicalize/hash → politeness-scheduled fetch → parse/extract
    → seen-set dedup → ledger transitions) and return the interleaved
    text+media documents table (doc_id, spans) — the BASELINE.json
    input_hint shape.  Also touches /root/testdata/sf0.001 to exercise the
    parquet read path."""
    import pyarrow.compute as pc
    import ray.data as rd

    from anansi_ray.pipelines.queries import _crawl_results

    sf_dir = "/root/testdata/sf0.001"
    if os.path.isdir(sf_dir):
        # cheap read-path smoke: prune to one column, count
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]).count()
    docs = _crawl_results()["documents"]
    return docs.take(pc.sort_indices(docs, sort_keys=[("doc_id", "ascending")]))


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    # materialize the oracle side-tables (pure-Python reference crawl,
    # media table, LSH candidate keys) that some SQL strings read via
    # read_parquet() — independent of whichever order the driver evaluates
    # queries vs oracles
    from anansi_ray.pipelines.queries import ensure_oracle_artifacts

    ensure_oracle_artifacts()
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
