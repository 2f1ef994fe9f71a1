"""Bucketed web store: the at-scale fetch path (S6-S8 storage layout).

The broadcast fetch path (``ray.put`` the whole web table) works to ~10^6
URLs per node; a 10^10-URL web cannot be broadcast.  The reference shards
its blob cache by ``shorthash % ncaches`` (``cache_bucket``,
/root/reference/libspider/queues/db.c:1235-1250, two-level disk fan-out
disk.c:349-375); this module is the same idea on partitioned parquet:

* ``bucketize_web``: one-time layout — write the web table as
  ``bucket=<i>/part.parquet`` with ``i = shorthash(cache_key(url)) % B``.
* ``fetch_bucketed``: scheduled frontier rows (metadata only — payloads
  never shuffle) are hash-exchanged on the SAME bucket key, then each
  bucket group reads just its own bucket file (partition-pruned, cached
  per worker process) and performs the keyed lookup + fetch protocol.

Lance would slot in behind the same two functions (keyed take instead of
per-bucket parquet); the layout/manifest contract is identical.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from anansi_ray.canon import cache_key, shorthash
from anansi_ray.model import CrawlConfig
from anansi_ray.stages.fetch import _WebTable, fetch_batch


def bucketize_web(web: pa.Table, out_dir: str, n_buckets: int = 16) -> str:
    """One-time bucketed layout of the web table (≙ cache_bucket sharding)."""
    buckets = pa.array(
        [shorthash(cache_key(u)) % n_buckets for u in web["url"].to_pylist()],
        pa.int32(),
    )
    web = web.append_column("cache_bucket", buckets)
    os.makedirs(out_dir, exist_ok=True)
    for b in range(n_buckets):
        sub = web.filter(pc.equal(web["cache_bucket"], b)).drop_columns(
            ["cache_bucket"]
        )
        bdir = os.path.join(out_dir, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        pq.write_table(sub, os.path.join(bdir, "part.parquet"))
    with open(os.path.join(out_dir, "_META"), "w") as f:
        f.write(str(n_buckets))
    return out_dir


def read_meta(store_dir: str) -> int:
    with open(os.path.join(store_dir, "_META")) as f:
        return int(f.read().strip())


_BUCKET_CACHE: dict = {}


def _bucket_web(store_dir: str, bucket: int) -> _WebTable:
    """Per-worker cache of one bucket's keyed view (loaded once, reused
    across rounds — ≙ ST3 'table handle opened once per worker')."""
    key = (store_dir, bucket)
    wt = _BUCKET_CACHE.get(key)
    if wt is None:
        tbl = pq.read_table(os.path.join(store_dir, f"bucket={bucket}", "part.parquet"))
        wt = _WebTable(tbl.combine_chunks())
        _BUCKET_CACHE[key] = wt
    return wt


def fetch_bucketed(
    scheduled: rd.Dataset,
    store_dir: str,
    robots: dict,
    cfg: CrawlConfig,
) -> rd.Dataset:
    """Partitioned keyed-lookup fetch: exchange frontier METADATA on the
    cache-bucket key, then fetch each group against only its own bucket
    file.  The web payloads never move; only frontier rows shuffle."""
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
        wt = _bucket_web(store_dir, bucket)
        out = fetch_batch(group.drop_columns(["cache_bucket"]), wt, robots, cfg)
        return out

    return (
        scheduled.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("cache_bucket")
        .map_groups(fetch_group, batch_format="pyarrow")
    )
