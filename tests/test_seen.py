"""URL-seen set: exact shard pool + cuckoo-filter backend."""

import hashlib

import numpy as np
import pytest

from anansi_ray.state.cuckoo import CuckooFilter


def _hashes(n, tag=""):
    return [hashlib.sha256(f"{tag}{i}".encode()).hexdigest()[:32] for i in range(n)]


class TestCuckoo:
    def test_no_false_negatives(self):
        f = CuckooFilter(capacity=5000)
        hs = _hashes(4000)
        for h in hs:
            assert f.add(h)
        assert all(f.contains(h) for h in hs)

    def test_add_if_new_contract(self):
        f = CuckooFilter(capacity=2000)
        hs = _hashes(1000)
        first = f.add_if_new(hs)
        again = f.add_if_new(hs)
        assert first.sum() >= 995  # tiny FP allowance
        assert not again.any()

    def test_false_positive_rate_bounded(self):
        f = CuckooFilter(capacity=20000)
        f.add_if_new(_hashes(15000, "in"))
        probe = _hashes(20000, "out")
        fp = sum(f.contains(h) for h in probe)
        assert fp / len(probe) < 0.01

    def test_memory_compact(self):
        f = CuckooFilter(capacity=1_000_000)
        # 2 B/slot, 4 slots/bucket, power-of-two buckets ⇒ ≤ ~4.4 B/URL
        assert f.bytes_used <= 4.5 * 1_000_000

    def test_dump_restore(self):
        f = CuckooFilter(capacity=1000)
        hs = _hashes(500)
        f.add_if_new(hs)
        blob = f.dump()
        g = CuckooFilter(capacity=1000)
        g.restore(blob)
        assert all(g.contains(h) for h in hs)
        assert g.count == f.count


@pytest.mark.usefixtures("ray_session")
class TestExactShards:
    def test_scatter_gather(self):
        from anansi_ray.state.seen import SeenSet

        s = SeenSet(num_shards=4)
        hs = _hashes(200)
        first = s.add_if_new(hs)
        assert first.all()
        assert not s.add_if_new(hs).any()
        assert s.contains(hs).all()
        assert not s.contains(_hashes(50, "other")).any()
        assert s.size() == 200

    def test_dump_restore_roundtrip(self):
        from anansi_ray.state.seen import SeenSet

        s = SeenSet(num_shards=2)
        hs = _hashes(100)
        s.add_if_new(hs)
        blobs = s.dump()
        t = SeenSet(num_shards=2)
        t.restore(blobs)
        assert not t.add_if_new(hs).any()
        assert t.size() == 100

    def test_cuckoo_backend_shards(self):
        from anansi_ray.state.seen import SeenSet

        s = SeenSet(num_shards=4, backend="cuckoo", capacity_per_shard=10_000)
        hs = _hashes(2000)
        first = s.add_if_new(hs)
        assert first.sum() >= 1990  # tiny FP allowance
        assert not s.add_if_new(hs).any()
        blobs = s.dump()
        t = SeenSet(num_shards=4, backend="cuckoo", capacity_per_shard=10_000)
        t.restore(blobs)
        assert not t.add_if_new(hs).any()


@pytest.mark.usefixtures("ray_session")
def test_cuckoo_crawl_close_to_exact():
    """Crawl with the approximate seen backend: fetched set is a subset of
    the exact crawl's and covers ≥99% of it."""
    from anansi_ray import fixtures
    from anansi_ray.model import CrawlConfig
    from anansi_ray.pipelines.crawl import CrawlPipeline

    tiny = fixtures.generate("tiny", seed=42)
    exact = CrawlPipeline(tiny, CrawlConfig()).run()
    approx = CrawlPipeline(tiny, CrawlConfig(seen_backend="cuckoo")).run()
    e = set(exact["expected_crawl"]["url_hash"].to_pylist())
    a = set(approx["expected_crawl"]["url_hash"].to_pylist())
    assert a <= e
    assert len(a) >= 0.99 * len(e)


class TestCuckooStash:
    def test_no_false_negatives_at_overfill(self):
        """Kick-exhausted victims park in the stash: every key ever added
        must still read as present (false POSITIVES are the documented
        failure mode, false negatives never)."""
        import hashlib

        from anansi_ray.state.cuckoo import CuckooFilter

        f = CuckooFilter(capacity=64)  # tiny: forces kicks + stash quickly
        keys = [hashlib.sha256(str(i).encode()).hexdigest()[:32] for i in range(200)]
        inserted = [k for k in keys if f.add(k)]
        assert len(inserted) >= 64  # filled past nominal capacity
        missing = [k for k in inserted if not f.contains(k)]
        assert missing == []

    def test_stash_survives_dump_restore(self):
        import hashlib

        from anansi_ray.state.cuckoo import CuckooFilter

        f = CuckooFilter(capacity=64)
        keys = [hashlib.sha256(str(i).encode()).hexdigest()[:32] for i in range(200)]
        inserted = [k for k in keys if f.add(k)]
        blob = f.dump()
        g = CuckooFilter(capacity=64)
        g.restore(blob)
        assert g.count == f.count
        assert all(g.contains(k) for k in inserted)
