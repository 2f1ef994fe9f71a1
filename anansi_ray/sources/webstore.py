"""Bucketed web store: the at-scale fetch path (S6-S8 storage layout).

The broadcast fetch path (``ray.put`` the whole web table) works to ~10^6
URLs per node; a 10^10-URL web cannot be broadcast.  The reference shards
its blob cache by ``shorthash % ncaches`` (``cache_bucket``,
/root/reference/libspider/queues/db.c:1235-1250, two-level disk fan-out
disk.c:349-375); this module is the same idea on partitioned parquet:

* ``bucketize_web``: one-time layout — ONE global sort by
  (cache_bucket, url_hash) then per-bucket slices (O(N log N), not the
  round-2 O(B·N) filter-per-bucket loop), each bucket written as a
  url_hash-SORTED parquet with small row groups so point lookups prune.
* ``fetch_bucketed``: scheduled frontier rows (metadata only — payloads
  never shuffle) are hash-exchanged on the SAME bucket key, then each
  bucket group reads ONLY the row groups whose url_hash [min, max] range
  intersects its scheduled keys (parquet statistics pruning) and performs
  the keyed lookup + fetch protocol.  Per-worker resident web memory is
  bounded by the row groups a round actually touches — the round-2 layout
  cached whole bucket files per worker.

Lance would slot in behind the same two functions (keyed take instead of
row-group-pruned parquet); the layout/manifest contract is identical.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from anansi_ray.canon import cache_key
from anansi_ray.model import CrawlConfig
from anansi_ray.stages.fetch import _WebTable, fetch_batch

#: rows per parquet row group in a bucket file — the pruning granule; a
#: round that schedules k keys in a bucket reads at most k row groups of
#: this many rows (usually far fewer: keys are hash-sorted, so consecutive
#: keys often share a granule)
ROW_GROUP_SIZE = 4096

#: layout marker (name doubles as a version: older _META dirs lack the
#: sorted-url_hash layout and are rebuilt)
META_NAME = "_META2"


def _add_layout_keys(batch: pa.Table, n_buckets: int) -> pa.Table:
    """Per-batch layout keys + concat-safe offsets.

    64-bit-offset variable-width columns: pyarrow's chunked take
    concatenates the SOURCE column first, so a multi-GB payload column
    with 32-bit offsets overflows; large_* types make the concat safe
    (parquet round-trips them back to regular binary/string)."""
    hashes = [cache_key(u) for u in batch["url"].to_pylist()]
    buckets = np.array([int(h[:8], 16) % n_buckets for h in hashes], dtype=np.int32)
    for i, f in enumerate(batch.schema):
        if f.type == pa.string():
            batch = batch.set_column(i, f.name, batch[f.name].cast(pa.large_string()))
        elif f.type == pa.binary():
            batch = batch.set_column(i, f.name, batch[f.name].cast(pa.large_binary()))
    batch = batch.append_column("url_hash", pa.array(hashes, pa.large_string()))
    return batch.append_column("cache_bucket", pa.array(buckets, pa.int32()))


def _finish_bucket(tmp_dir: str, out_dir: str, bucket: int) -> tuple[int, int]:
    """In-task per-bucket finish: read the bucket's phase-1 pieces from the
    filesystem exchange, sort by url_hash, and write ONE url_hash-sorted
    parquet with small row groups (the pruning granule).  Runs on a worker;
    the driver only ever sees the (bucket, rows) manifest pair.  Peak task
    memory is ~2× one uncompressed bucket (read + sorted gather)."""
    bdir_in = os.path.join(tmp_dir, f"cache_bucket={bucket}")
    group = pq.read_table(bdir_in)
    if "cache_bucket" in group.column_names:  # hive partition col on read
        group = group.drop_columns(["cache_bucket"])
    hashes = np.asarray(group["url_hash"].to_pylist(), dtype=object)
    order = np.argsort(hashes, kind="stable")
    sub = group.take(pa.array(order, pa.int64()))
    bdir = os.path.join(out_dir, f"bucket={bucket}")
    os.makedirs(bdir, exist_ok=True)
    # store_schema=False: readers get plain string/binary back (the
    # large_* offsets were only a transient concat-safety measure)
    pq.write_table(
        sub,
        os.path.join(bdir, "part.parquet"),
        row_group_size=ROW_GROUP_SIZE,
        store_schema=False,
    )
    return bucket, group.num_rows


def bucketize_web(
    web: pa.Table | rd.Dataset, out_dir: str, n_buckets: int = 16
) -> str:
    """One-time bucketed layout of the web table (≙ cache_bucket sharding,
    db.c:1235-1250) as a two-phase FILESYSTEM exchange:

    1. per-batch key stamping → streaming hive-partitioned parquet write
       (``partition_cols=["cache_bucket"]``) — each block splits itself
       into its bucket dirs as it flows; NO all-to-all, nothing ever
       pools in the object store (a ``groupby`` exchange here would
       materialize ~2× the uncompressed web in spill — measured fatal at
       16M rows on this host's disk quota);
    2. one Ray task per bucket reads its pieces, sorts by url_hash, and
       writes the final row-group-pruned bucket file.

    The driver never materializes the web: it receives only the B-row
    manifest.  Partitioning assumption: one bucket must fit a worker's
    heap for the in-task sort — size ``n_buckets`` ≥ total_bytes /
    (worker_heap / 2); buckets are cheap (the fetch side prunes by row
    group, not by bucket count).  A pa.Table argument is wrapped via
    from_arrow for fixture-scale convenience (blocks still flow through
    the same exchange)."""
    import shutil

    import ray

    ds = web if isinstance(web, rd.Dataset) else rd.from_arrow(web)
    os.makedirs(out_dir, exist_ok=True)
    tmp_dir = os.path.join(out_dir, "_exchange_tmp")
    if os.path.exists(tmp_dir):  # stale partial phase-1 from a killed run
        shutil.rmtree(tmp_dir)
    ds.map_batches(
        lambda b: _add_layout_keys(b, n_buckets), batch_format="pyarrow"
    ).write_parquet(tmp_dir, partition_cols=["cache_bucket"])
    present = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(tmp_dir)
        if d.startswith("cache_bucket=")
    )
    finish = ray.remote(num_cpus=1)(_finish_bucket)
    manifest = [
        {"bucket": b, "rows": n}
        for b, n in ray.get(
            [finish.remote(tmp_dir, out_dir, b) for b in present]
        )
    ]
    shutil.rmtree(tmp_dir)
    total = sum(r["rows"] for r in manifest)
    # empty buckets still need a (zero-row) file: the fetch side opens
    # bucket files by scheduled-key bucket, which is independent of which
    # buckets hold web rows
    present_set = {r["bucket"] for r in manifest}
    missing = [b for b in range(n_buckets) if b not in present_set]
    if missing:
        donor = next(iter(present), None)
        if donor is None:
            raise ValueError("bucketize_web: empty web table")
        schema = pq.read_schema(os.path.join(out_dir, f"bucket={donor}", "part.parquet"))
        for b in missing:
            bdir = os.path.join(out_dir, f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            pq.write_table(
                schema.empty_table(), os.path.join(bdir, "part.parquet"), store_schema=False
            )
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        f.write(str(n_buckets))
    with open(os.path.join(out_dir, "_MANIFEST"), "w") as f:
        for r in sorted(manifest, key=lambda r: r["bucket"]):
            f.write(f"{r['bucket']}\t{r['rows']}\n")
        f.write(f"total\t{total}\n")
    return out_dir


def _bucketize_web_local(web: pa.Table, out_dir: str, n_buckets: int = 16) -> str:
    """Driver-side reference layout (the retired round-3 implementation):
    one global lexsort + whole-table gather.  Kept as the equality twin
    for tests — identical bucket-file contract, no Ray session needed."""
    hashes = np.asarray([cache_key(u) for u in web["url"].to_pylist()], dtype=object)
    buckets = np.array([int(h[:8], 16) % n_buckets for h in hashes], dtype=np.int32)
    for i, f in enumerate(web.schema):
        if f.type == pa.string():
            web = web.set_column(i, f.name, web[f.name].cast(pa.large_string()))
        elif f.type == pa.binary():
            web = web.set_column(i, f.name, web[f.name].cast(pa.large_binary()))
    web = web.append_column("url_hash", pa.array(hashes, pa.large_string()))
    order = np.lexsort((hashes, buckets))
    web = web.take(pa.array(order, pa.int64()))
    bsorted = buckets[order]
    bounds = np.searchsorted(bsorted, np.arange(n_buckets + 1))
    os.makedirs(out_dir, exist_ok=True)
    for b in range(n_buckets):
        s, e = int(bounds[b]), int(bounds[b + 1])
        sub = web.slice(s, e - s)
        bdir = os.path.join(out_dir, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        pq.write_table(
            sub,
            os.path.join(bdir, "part.parquet"),
            row_group_size=ROW_GROUP_SIZE,
            store_schema=False,
        )
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        f.write(str(n_buckets))
    return out_dir


def read_meta(store_dir: str) -> int:
    with open(os.path.join(store_dir, META_NAME)) as f:
        return int(f.read().strip())


#: per-worker cache of bucket file handles + row-group url_hash ranges —
#: METADATA only (a few hundred bytes per row group), never payload rows
_RG_META_CACHE: dict = {}


def _bucket_meta(store_dir: str, bucket: int):
    key = (store_dir, bucket)
    hit = _RG_META_CACHE.get(key)
    if hit is None:
        path = os.path.join(store_dir, f"bucket={bucket}", "part.parquet")
        pf = pq.ParquetFile(path)
        ci = pf.schema_arrow.get_field_index("url_hash")
        mins, maxs = [], []
        for r in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(r).column(ci).statistics
            mins.append(st.min)
            maxs.append(st.max)
        hit = (pf, np.array(mins, dtype=object), np.array(maxs, dtype=object))
        _RG_META_CACHE[key] = hit
    return hit


def _bucket_slice(store_dir: str, bucket: int, keys_sorted: np.ndarray) -> _WebTable:
    """Read ONLY the row groups whose url_hash range intersects the sorted
    key list; the keyed view is built over that slice (small), so resident
    memory per task is bounded by touched row groups."""
    pf, mins, maxs = _bucket_meta(store_dir, bucket)
    if len(mins) == 0 or len(keys_sorted) == 0:
        return _WebTable(pf.schema_arrow.empty_table())
    lo = np.searchsorted(keys_sorted, mins)  # first key >= row-group min
    lo_c = np.minimum(lo, len(keys_sorted) - 1)
    need = (lo < len(keys_sorted)) & (keys_sorted[lo_c] <= maxs)
    idxs = np.flatnonzero(need)
    if len(idxs) == 0:
        return _WebTable(pf.schema_arrow.empty_table())
    return _WebTable(pf.read_row_groups([int(i) for i in idxs]))


def fetch_bucketed(
    scheduled: rd.Dataset,
    store_dir: str,
    robots: dict,
    cfg: CrawlConfig,
) -> rd.Dataset:
    """Partitioned keyed-lookup fetch: exchange frontier METADATA on the
    cache-bucket key, then fetch each group against only the row groups of
    its bucket file that its keys touch.  The web payloads never move;
    only frontier rows shuffle."""
    n_buckets = read_meta(store_dir)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = pa.array(
            [int(h[:8], 16) % n_buckets for h in batch["url_hash"].to_pylist()],
            pa.int32(),
        )
        return batch.append_column("cache_bucket", b)

    def fetch_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group
        bucket = int(group["cache_bucket"][0].as_py())
        keys = np.sort(np.asarray(group["url_hash"].to_pylist(), dtype=object))
        wt = _bucket_slice(store_dir, bucket, keys)
        return fetch_batch(group.drop_columns(["cache_bucket"]), wt, robots, cfg)

    return (
        scheduled.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("cache_bucket")
        .map_groups(fetch_group, batch_format="pyarrow")
    )
