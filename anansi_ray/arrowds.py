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


_COARSE_OPS = ("sum", "min", "max", "count")


def coarse_agg(
    ds: rd.Dataset,
    key: "str | list[str]",
    aggs: dict,
    n_parts: int = 32,
    key_type: "pa.DataType | None" = None,
) -> rd.Dataset:
    """Aggregate by a (near-)unique key via ONE coarse hash exchange.

    ``groupby(key).aggregate(...)`` on a high-cardinality key is Ray's
    sort-based shuffle: it range-sorts the whole key domain to merge keys
    that mostly appear once — ~10× slower than exchanging on a 32-value
    hash of the key and combining in-kernel (every row of a key lands in
    one partition, so per-key results are exact there).  This is the
    repo-wide primitive for that shape.

    ``key`` is one column name or a list (composite keys combine the
    per-column hashes for the partition assignment and lexsort in-kernel).
    ``aggs`` maps output column → ("sum"|"min"|"max"|"count", input_col);
    for "count" the input_col is ignored.  Rows are pre-combined per batch
    BEFORE the exchange (the combiner/partial-aggregate step), so shuffle
    volume is bounded by per-batch distinct keys.  Integer sums are
    summation-order-free; float sums follow the same per-key in-partition
    ordering every run (sorted by key), so results are deterministic.

    Keys may be integer or string (strings hash via
    ``pandas.util.hash_array`` — deterministic across processes).
    Returns a Dataset of (*keys, *outputs) with empty blocks dropped.
    """
    import numpy as np
    import pandas as pd

    keys = [key] if isinstance(key, str) else list(key)

    for op, _ in aggs.values():
        if op not in _COARSE_OPS:
            raise ValueError(f"coarse_agg: unknown op {op!r}")

    # resolve output Arrow types (for the typed-empty contract)
    in_types: dict[str, pa.DataType] = {}
    try:
        schema = ds.schema(fetch_if_missing=True)
        base = getattr(schema, "base_schema", schema)
        if isinstance(base, pa.Schema):
            in_types = dict(zip(base.names, base.types))
    except Exception:
        pass
    key_types = {}
    for k in keys:
        t = in_types.get(k, key_type if key_type is not None else pa.int64())
        key_types[k] = t

    def _is_str(t: pa.DataType) -> bool:
        return pa.types.is_string(t) or pa.types.is_large_string(t)

    def out_type(op: str, col: str) -> pa.DataType:
        if op == "count":
            return pa.int64()
        t = in_types.get(col, pa.int64())
        if op == "sum" and pa.types.is_integer(t):
            return pa.int64()
        return t

    out_types = {name: out_type(op, col) for name, (op, col) in aggs.items()}
    empty_tbl = pa.table(
        {k: pa.array([], t) for k, t in key_types.items()}
        | {name: pa.array([], t) for name, t in out_types.items()}
    )

    def _key_np(tbl: pa.Table, k: str):
        if _is_str(key_types[k]):
            return tbl[k].to_pandas().to_numpy(dtype=object)
        return tbl[k].to_numpy(zero_copy_only=False)

    def _combine(tbl: pa.Table, ops: dict) -> pa.Table:
        karrs = [_key_np(tbl, k) for k in keys]
        # lexsort: last key in the list is the primary sort key for
        # np.lexsort, so reverse — any consistent order works here
        order = np.lexsort(karrs[::-1]) if len(karrs) > 1 else np.argsort(
            karrs[0], kind="stable"
        )
        ksorted = [a[order] for a in karrs]
        n = len(order)
        if n:
            diff = np.zeros(n - 1, bool)
            for a in ksorted:
                diff |= a[1:] != a[:-1]
            new = np.r_[True, diff]
        else:
            new = np.zeros(0, bool)
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        cols = {
            k: pa.array(a[starts], key_types[k])
            for k, a in zip(keys, ksorted)
        }
        for name, (op, col) in ops.items():
            if op == "count":
                v = np.diff(np.r_[starts, n]).astype(np.int64)
            else:
                x = tbl[col].to_numpy(zero_copy_only=False)[order]
                if op == "sum":
                    acc_t = (
                        np.int64 if pa.types.is_integer(out_types[name]) else np.float64
                    )
                    v = np.zeros(len(starts), acc_t)
                    np.add.at(v, run_id, x)
                elif op == "min":
                    v = x[starts].copy()
                    np.minimum.at(v, run_id, x)
                else:  # max
                    v = x[starts].copy()
                    np.maximum.at(v, run_id, x)
            cols[name] = pa.array(v, out_types[name])
        return pa.table(cols)

    # after the per-batch pre-combine, counts become sums of partial counts
    final_ops = {
        name: ("sum" if op == "count" else op, name) for name, (op, _) in aggs.items()
    }

    def pre_combine(b: pa.Table) -> pa.Table:
        t = _combine(b, aggs)
        h = np.zeros(t.num_rows, np.uint64)
        for k in keys:
            a = _key_np(t, k)
            if _is_str(key_types[k]):
                hk = pd.util.hash_array(a)
            else:
                hk = pd.util.hash_array(np.ascontiguousarray(a))
            h = h * np.uint64(31) + hk
        part = (h % np.uint64(n_parts)).astype(np.int32)
        return t.append_column("part", pa.array(part, pa.int32()))

    def finish_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty_tbl
        return _combine(g, final_ops)

    # typed 0-row sentinel: a fully empty source never invokes the UDFs,
    # so without it the result would reach the driver schema-less
    return drop_empty_blocks(
        ds.map_batches(pre_combine, batch_format="pyarrow")
        .groupby("part")
        .map_groups(finish_part, batch_format="pyarrow")
        .union(from_arrow_local(empty_tbl))
        .materialize()
    )


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


# ---------------------------------------------------------------------------
# Partition-once / iterate-in-place plumbing for iterative algorithms.
# Static per-iteration state (edge lists, baseline node rows) is grouped by
# its ``part`` column ONE time; supersteps then look a part's blocks up by
# ObjectRef inside the group kernel — zero-copy from the object store,
# never re-shuffled, never driver-resident.  Only iteration-variant rows
# (ranks, labels, frontiers) cross the wire each superstep.

def group_once(ds: rd.Dataset) -> rd.Dataset:
    return (
        ds.groupby("part")
        .map_groups(lambda g: g, batch_format="pyarrow")
        .materialize()
    )


def refs_by_part(grouped: rd.Dataset) -> dict:
    """{part → [block ObjectRef]} WITHOUT pulling any block to the driver
    (a tiny remote probe reads each block's distinct part values)."""
    import numpy as np
    import ray

    refs = grouped.to_arrow_refs()

    @ray.remote
    def parts_of(t: pa.Table):
        if t.num_rows == 0:
            return []
        return np.unique(t["part"].to_numpy(zero_copy_only=False)).tolist()

    plists = ray.get([parts_of.remote(r) for r in refs])
    out: dict = {}
    for pl, r in zip(plists, refs):
        for p in pl:
            out.setdefault(int(p), []).append(r)
    return out


def fetch_part(refs: dict, p: int) -> "pa.Table | None":
    """Concatenate (and part-filter, in case blocks coalesced groups) the
    blocks holding partition ``p`` — called INSIDE group kernels, so the
    ray.get is a worker-local zero-copy object-store read."""
    import pyarrow.compute as pc
    import ray

    rs = refs.get(p)
    if not rs:
        return None
    tabs = [ray.get(r) for r in rs]
    t = tabs[0] if len(tabs) == 1 else pa.concat_tables(tabs)
    mask = pc.equal(t["part"], pa.scalar(p, t["part"].type))
    if not pc.all(mask).as_py():
        t = t.filter(mask)
    return t if t.num_rows else None
