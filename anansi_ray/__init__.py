"""anansi_ray — a Ray-Data-native Linked-Open-Data crawl & data-processing
engine with the query/data-processing capabilities of bbcarchdev/anansi,
re-expressed as ray.data.Dataset pipelines over zero-copy Arrow batches.

Not a port: the reference (/root/reference, C, record-at-a-time over SQL) is
the behavioral spec only.  Architecture:

* frontier/ledger = immutable per-round Datasets (Parquet/Lance checkpoints)
* fetch = actor-pool map_batches against a synthetic web table
* URL-seen set = sharded filter state; exact fallback = groupby(url_hash)
* politeness = per-host token buckets on a simulated clock
* documents = interleaved text+media span tables
"""

__version__ = "0.1.0"

from anansi_ray.model import CrawlState, CrawlConfig  # noqa: F401
