"""Driver-local Arrow-table → Dataset construction.

``ray.data.from_arrow`` (→ ``from_arrow_refs``) launches one remote
``get_table_block_metadata`` task per block and blocks on the round trips
before the Dataset even exists — with tens of driver-held slices that RPC
fan-out is pure fixed latency (~0.25 s per 64 slices, measured via cProfile:
ray/data/read_api.py:3124).  The driver already holds the tables, so the
block metadata is a local computation.
"""
from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd


def from_arrow_local(tables) -> rd.Dataset:
    """``rd.from_arrow`` twin that computes block metadata on the DRIVER.

    Falls back to ``rd.from_arrow`` if Ray's internal constructor surface
    shifts (the fast path touches ``ray.data._internal``)."""
    if isinstance(tables, pa.Table):
        tables = [tables]
    try:
        from ray.data._internal.logical.interfaces import LogicalPlan
        from ray.data._internal.logical.operators.from_operators import FromArrow
        from ray.data._internal.plan import ExecutionPlan
        from ray.data._internal.stats import DatasetStats
        from ray.data.block import BlockExecStats, BlockMetadataWithSchema
        from ray.data.context import DataContext
        from ray.data.dataset import MaterializedDataset

        refs, mds = [], []
        for t in tables:
            stats = BlockExecStats.builder()
            mds.append(BlockMetadataWithSchema.from_block(t, stats=stats.build()))
            refs.append(ray.put(t))
        execution_plan = ExecutionPlan(
            DatasetStats(metadata={"FromArrow": mds}, parent=None),
            DataContext.get_current().copy(),
        )
        logical_plan = LogicalPlan(FromArrow(refs, mds), execution_plan._context)
        return MaterializedDataset(execution_plan, logical_plan)
    except (ImportError, AttributeError, TypeError):
        return rd.from_arrow(tables)


def drop_empty_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Rebuild a MATERIALIZED Dataset without its zero-row blocks.

    Ray's sort-based ``groupby().map_groups`` emits one block per range
    partition; partitions with no rows become zero-row blocks that carry an
    EMPTY schema (``map_batches`` UDFs are never invoked on them, so no
    downstream stage can repair them).  Left in place they pollute every
    later ``union`` with "operator produced a RefBundle with a different
    schema" behavior.  Block metadata (num_rows) is already driver-local on
    a materialized dataset, so the filter is pure bookkeeping: keep the
    non-empty block refs and re-wrap them — no data moves, no tasks launch.

    Falls back to returning ``ds`` unchanged if Ray's internal constructor
    surface shifts.
    """
    try:
        from ray.data._internal.logical.interfaces import LogicalPlan
        from ray.data._internal.logical.operators.from_operators import FromArrow
        from ray.data._internal.plan import ExecutionPlan
        from ray.data._internal.stats import DatasetStats
        from ray.data.block import BlockMetadataWithSchema
        from ray.data.context import DataContext
        from ray.data.dataset import MaterializedDataset
        from ray.data.dataset import Schema as _DSchema

        refs, mds = [], []
        saw_empty = False
        # best empty block to keep if EVERY block is empty: prefer one whose
        # schema actually has fields (an empty-schema survivor would
        # reintroduce the union mismatch this function exists to fix)
        keep_empty = None
        for bundle in ds.iter_internal_ref_bundles():
            schema = bundle.schema
            if isinstance(schema, _DSchema):
                schema = schema.base_schema
            for ref, md in bundle.blocks:
                if md.num_rows:
                    refs.append(ref)
                    mds.append(BlockMetadataWithSchema(md, schema))
                else:
                    saw_empty = True
                    has_fields = schema is not None and len(schema.names) > 0
                    if keep_empty is None or (has_fields and not keep_empty[2]):
                        keep_empty = (ref, md, has_fields, schema)
        if not saw_empty:
            return ds
        if not refs:
            # every block empty: keep exactly ONE, carrying a real
            # (non-empty) schema when any block has one.  The kept block
            # must be PHYSICALLY typed — re-wrapping the original ref only
            # fixes the metadata, and ``to_pandas`` reads the block bytes,
            # so an all-filtered result would still reach the driver as a
            # 0-column frame (tiny-input sweep, round 4).
            ref, md, has_fields, schema = keep_empty
            if has_fields:
                ref = ray.put(schema.empty_table())
            refs.append(ref)
            mds.append(BlockMetadataWithSchema(md, schema))
        execution_plan = ExecutionPlan(
            DatasetStats(metadata={"FromArrow": mds}, parent=None),
            DataContext.get_current().copy(),
        )
        logical_plan = LogicalPlan(FromArrow(refs, mds), execution_plan._context)
        return MaterializedDataset(execution_plan, logical_plan)
    except (ImportError, AttributeError, TypeError) as exc:
        # a Ray upgrade moved the private constructor surface: without the
        # rebuild, empty-schema blocks will resurface downstream as
        # RefBundle schema mismatches far from here — make that diagnosable
        import logging

        logging.getLogger(__name__).warning(
            "drop_empty_blocks: ray.data internals unavailable (%s); "
            "returning dataset unmodified — empty-schema blocks may "
            "surface later as union/RefBundle schema mismatches",
            exc,
        )
        return ds


def stable_frame(df, schema: dict):
    """Reinstate declared output columns on an all-empty driver frame.

    Ray's ``map_batches``/``map_groups`` never invoke the UDF on an empty
    input block and emit a schema-LESS empty block instead, so a pipeline
    whose every row is filtered out (or whose source is empty) reaches the
    driver as a 0-column DataFrame and the finishing ``sort_values``/
    ``groupby`` raises KeyError.  A no-op whenever the columns survived;
    ``schema`` maps column name → pandas dtype string."""
    import pandas as pd

    if len(df) == 0 and not set(schema) <= set(df.columns):
        return pd.DataFrame(
            {c: pd.Series([], dtype=t) for c, t in schema.items()}
        )
    return df


def _schema_empty_frame(ds: rd.Dataset):
    """Typed 0-row DataFrame from the dataset-level schema, or None if the
    schema is unavailable / not an Arrow schema."""
    try:
        schema = ds.schema(fetch_if_missing=True)
    except Exception:  # pragma: no cover - schema fetch is best-effort here
        return None
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema) and len(base.names):
        return base.empty_table().to_pandas()
    return None


def stable_pandas(ds: rd.Dataset):
    """``ds.to_pandas()`` that keeps the column schema on an ALL-EMPTY
    dataset.

    ``to_pandas`` iterates ``iter_batches``, which yields nothing for
    0-row blocks — so a fully-filtered result reaches the driver as a
    0-column frame no matter how well-typed the blocks are, and the
    finishing ``sort_values``/``groupby`` raises KeyError.  At scale some
    partition is always empty, so every driver-side finish must tolerate
    this shape.  Falls back to the dataset-level schema (Arrow path) to
    rebuild the typed empty frame."""
    df = ds.to_pandas()
    if len(df.columns) == 0:
        fixed = _schema_empty_frame(ds)
        if fixed is not None:
            return fixed
    return df


_STABLE_TO_PANDAS_INSTALLED = False


def install_stable_to_pandas() -> None:
    """Make ``Dataset.to_pandas`` schema-stable process-wide.

    Every driver-side query finish funnels through ``to_pandas``; the
    0-row → 0-column loss described in ``stable_pandas`` therefore breaks
    ANY pipeline whose result is empty (a filter that matched nothing, an
    empty input partition — at 100 TB a certainty somewhere).  Rather than
    wrap all ~130 call sites, this installs ``stable_pandas``'s recovery
    directly onto ``ray.data.Dataset.to_pandas`` — behavior is unchanged
    whenever any column survives; only the all-empty shape gains its
    declared schema back.  Idempotent; the original is kept on
    ``__wrapped__``."""
    global _STABLE_TO_PANDAS_INSTALLED
    if _STABLE_TO_PANDAS_INSTALLED:
        return
    orig = rd.Dataset.to_pandas

    def to_pandas(self, *args, **kwargs):
        df = orig(self, *args, **kwargs)
        if len(df.columns) == 0:
            fixed = _schema_empty_frame(self)
            if fixed is not None:
                return fixed
        return df

    to_pandas.__wrapped__ = orig
    to_pandas.__doc__ = orig.__doc__
    rd.Dataset.to_pandas = to_pandas
    _STABLE_TO_PANDAS_INSTALLED = True


def ts_us(col: "pa.ChunkedArray | pa.Array") -> "pa.ChunkedArray | pa.Array":
    """Epoch-microsecond int64 view of a column, UNIT-SAFE: a timestamp of
    any unit (s/ms/us/ns) is first normalized to microseconds — matching
    DuckDB's ``epoch_us`` — while an already-integer column passes
    through.  A bare ``cast(int64)`` on a timestamp silently yields the
    STORAGE unit (ns parquet → ns ints), which corrupts every day/hour
    bucketing kernel downstream; this helper is the single conversion
    point (found by the tie-heavy timeline fuzz)."""
    t = col.type
    if pa.types.is_timestamp(t):
        if t.unit != "us":
            col = col.cast(pa.timestamp("us", tz=t.tz))
        return col.cast(pa.int64())
    return col.cast(pa.int64())
