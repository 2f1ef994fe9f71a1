"""Bucketed web store: partition-pruned keyed-lookup fetch must equal the
broadcast fetch path bit-for-bit."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from anansi_ray import fixtures
from anansi_ray.canon import canon_batch
from anansi_ray.model import CrawlConfig
from anansi_ray.sources.webstore import bucketize_web, fetch_bucketed, read_meta
from anansi_ray.stages.fetch import _WebTable, fetch_batch


def _scheduled_table(web: pa.Table) -> pa.Table:
    c = canon_batch(web["url"].to_pylist())
    n = len(c["url"])
    return pa.table(
        {
            "url": pa.array(c["url"], pa.string()),
            "url_hash": pa.array(c["url_hash"], pa.string()),
            "host": pa.array(c["host"], pa.string()),
            "depth": pa.array(np.zeros(n, np.int32)),
            "state": pa.array(["NEW"] * n, pa.string()),
            "status": pa.array(np.zeros(n, np.int32)),
            "next_fetch_ms": pa.array(np.zeros(n, np.int64)),
            "error_count": pa.array(np.zeros(n, np.int32)),
            "soft_error_count": pa.array(np.zeros(n, np.int32)),
            "updated_ms": pa.array(np.zeros(n, np.int64)),
            "fetch_clock_ms": pa.array(np.zeros(n, np.int64)),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_bucketed_fetch_equals_broadcast(tmp_path):
    import ray.data as rd

    tiny = fixtures.generate("tiny", seed=42)
    web = tiny["web"].combine_chunks()
    store = bucketize_web(web, str(tmp_path / "webstore"), n_buckets=8)
    assert read_meta(store) == 8

    cfg = CrawlConfig()
    robots = {
        r["host"]: r["robots_disallow"]
        for r in tiny["hosts"].to_pylist()
        if r["robots_disallow"]
    }
    sched = _scheduled_table(web)

    broadcast = fetch_batch(sched, _WebTable(web), robots, cfg)
    bucketed = (
        fetch_bucketed(rd.from_arrow(sched), store, robots, cfg)
        .to_pandas()
        .sort_values("url_hash", ignore_index=True)
    )

    order = pc.sort_indices(broadcast, sort_keys=[("url_hash", "ascending")])
    broadcast = broadcast.take(order)
    assert len(bucketed) == broadcast.num_rows
    for col in ("url_hash", "status", "state", "content_type", "redirect", "fresh"):
        assert bucketed[col].tolist() == broadcast[col].to_pylist(), col
    assert [list(x) for x in bucketed["out_links"]] == broadcast["out_links"].to_pylist()


@pytest.mark.usefixtures("ray_session")
def test_distributed_bucketize_equals_local_layout(tmp_path):
    """The distributed bucketize (exchange + in-task sort) must produce the
    same per-bucket file contents as the retired driver-side global sort."""
    from anansi_ray.sources.webstore import _bucketize_web_local
    import pyarrow.parquet as pq
    import os

    tiny = fixtures.generate("tiny", seed=42)
    web = tiny["web"].combine_chunks()
    dist = bucketize_web(web, str(tmp_path / "dist"), n_buckets=8)
    local = _bucketize_web_local(web, str(tmp_path / "local"), n_buckets=8)
    assert read_meta(dist) == read_meta(local) == 8
    for b in range(8):
        td = pq.read_table(os.path.join(dist, f"bucket={b}", "part.parquet"))
        tl = pq.read_table(os.path.join(local, f"bucket={b}", "part.parquet"))
        assert td.schema == tl.schema, b
        assert td.equals(tl), f"bucket {b} differs"
    # manifest totals the web
    with open(os.path.join(dist, "_MANIFEST")) as f:
        total = int(f.read().strip().splitlines()[-1].split("\t")[1])
    assert total == web.num_rows


@pytest.mark.usefixtures("ray_session")
def test_distributed_bucketize_empty_buckets_readable(tmp_path):
    """Buckets that hold no web rows still get a zero-row file so the fetch
    side can open them for scheduled keys that hash there."""
    import pyarrow.parquet as pq
    import os

    tiny = fixtures.generate("tiny", seed=42)
    web = tiny["web"].combine_chunks().slice(0, 3)  # few rows, many buckets
    store = bucketize_web(web, str(tmp_path / "sparse"), n_buckets=64)
    n_files = sum(
        1 for b in range(64)
        if os.path.exists(os.path.join(store, f"bucket={b}", "part.parquet"))
    )
    assert n_files == 64
    total = sum(
        pq.read_metadata(os.path.join(store, f"bucket={b}", "part.parquet")).num_rows
        for b in range(64)
    )
    assert total == 3
