"""Sharded URL-seen set (ST1 / J2 / D1).

The reference's URL-seen check is a PK probe-before-insert transaction on
``crawl_resource`` (/root/reference/libspider/queues/db.c:1202-1262).  Here
it is a pool of shard actors, each owning the fingerprint set for
``shorthash % num_shards`` — the same uniform partitioning the reference
derives from the cache key (db.c:836-838).  Raw actors are justified (vs a
Dataset op) because this is a shared *mutable* index probed by every round.

Memory: shards hold exact 16-byte fingerprints (the hex key decoded), so a
10^10-URL frontier costs ~160 GB across the cluster — spread over
``num_shards`` actors placed by Ray, with ``dump()/restore()`` hooks so each
shard checkpoints alongside the round manifests.  A cuckoo-filter drop-in
would cut that ~10×; the exact set keeps conformance bit-exact.

The batch router groups a candidate batch by owning shard and issues the
``add_if_new`` calls concurrently (one RPC per shard per batch, not per row).
"""

from __future__ import annotations

import numpy as np
import ray


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard of the URL-seen set; owns hashes with shorthash % n == id.

    ``backend="exact"`` (default) keeps exact 16-byte fingerprints — the
    conformance-grade store.  ``backend="cuckoo"`` swaps in the compact
    cuckoo filter (state/cuckoo.py, ~2-4 B/URL) for memory-bound frontiers;
    its rare false positives drop genuinely-new URLs, so it is the
    approximate option (SURVEY ST1's "cuckoo-filter actors; exact fallback").
    """

    def __init__(self, shard_id: int, backend: str = "exact", capacity: int = 1_000_000):
        self.shard_id = shard_id
        self.backend = backend
        self.capacity = capacity
        if backend == "cuckoo":
            from anansi_ray.state.cuckoo import CuckooFilter

            self._cuckoo = CuckooFilter(capacity=capacity, seed=42 + shard_id)
            self._set = None
        else:
            self._cuckoo = None
            self._set: set[bytes] | None = set()

    def add_if_new(self, fingerprints: list[bytes]) -> np.ndarray:
        """Insert-if-absent (db.c:1210-1234): returns per-item True when the
        fingerprint was new. First occurrence in the list wins."""
        if self._cuckoo is not None:
            return self._cuckoo.add_if_new([fp.hex() for fp in fingerprints])
        s = self._set
        out = np.zeros(len(fingerprints), dtype=bool)
        for i, fp in enumerate(fingerprints):
            if fp not in s:
                s.add(fp)
                out[i] = True
        return out

    def contains(self, fingerprints: list[bytes]) -> np.ndarray:
        if self._cuckoo is not None:
            return np.fromiter(
                (self._cuckoo.contains(fp.hex()) for fp in fingerprints),
                dtype=bool,
                count=len(fingerprints),
            )
        s = self._set
        return np.fromiter((fp in s for fp in fingerprints), dtype=bool,
                           count=len(fingerprints))

    def size(self) -> int:
        if self._cuckoo is not None:
            return self._cuckoo.count
        return len(self._set)

    def clear(self) -> None:
        """Drop all fingerprints (used by the fetched-set shards after a
        frontier compaction has physically removed the rows they guard)."""
        if self._cuckoo is not None:
            from anansi_ray.state.cuckoo import CuckooFilter

            self._cuckoo = CuckooFilter(capacity=self.capacity, seed=42 + self.shard_id)
        else:
            self._set = set()

    def dump(self) -> bytes:
        """Serialized shard state for round checkpoints."""
        if self._cuckoo is not None:
            return self._cuckoo.dump()
        return b"".join(sorted(self._set))

    def restore(self, blob: bytes) -> int:
        if self._cuckoo is not None:
            self._cuckoo.restore(blob)
            return self._cuckoo.count
        self._set = {blob[i : i + 16] for i in range(0, len(blob), 16)}
        return len(self._set)


def route_hashes(
    url_hashes, n: int
) -> tuple[list[list[bytes]], list[list[int]]]:
    """THE shard-routing rule — ``int(h[:8], 16) % n`` over the hex
    url_hash, fingerprint = raw bytes of the hash.  Single definition
    shared by SeenSet and all three map_batches-side routers so the rule
    can never diverge between the due-filter's read path and the
    bookkeeping write path."""
    per_fp: list[list[bytes]] = [[] for _ in range(n)]
    per_idx: list[list[int]] = [[] for _ in range(n)]
    for i, h in enumerate(url_hashes):
        s = int(h[:8], 16) % n
        per_fp[s].append(bytes.fromhex(h))
        per_idx[s].append(i)
    return per_fp, per_idx


class SeenSet:
    """Driver-side facade over the shard pool."""

    def __init__(
        self,
        num_shards: int = 8,
        backend: str = "exact",
        capacity_per_shard: int = 1_000_000,
    ):
        self.num_shards = num_shards
        self.shards = [
            SeenShard.remote(i, backend, capacity_per_shard)
            for i in range(num_shards)
        ]

    def _scatter_gather(self, url_hashes, method) -> np.ndarray:
        fps, idxs = route_hashes(url_hashes, self.num_shards)
        futures = {
            s: getattr(self.shards[s], method).remote(fps[s])
            for s in range(self.num_shards)
            if fps[s]
        }
        out = np.zeros(len(url_hashes), dtype=bool)
        for s, fut in futures.items():
            out[np.array(idxs[s])] = ray.get(fut)
        return out

    def add_if_new(self, url_hashes) -> np.ndarray:
        return self._scatter_gather(url_hashes, "add_if_new")

    def contains(self, url_hashes) -> np.ndarray:
        return self._scatter_gather(url_hashes, "contains")

    def clear(self) -> None:
        ray.get([s.clear.remote() for s in self.shards])

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def dump(self) -> list[bytes]:
        return ray.get([s.dump.remote() for s in self.shards])

    def restore(self, blobs: list[bytes]) -> None:
        ray.get([s.restore.remote(b) for s, b in zip(self.shards, blobs)])


def make_seen_filter(shard_handles):
    """Stateless-task variant of :class:`SeenRouter` (the shard handles are
    tiny and pickle into the task closure; the mutable state lives in the
    shard actors, so the routing task itself needs no actor pool)."""
    router = SeenRouter(shard_handles)

    def seen_filter(batch):
        return router(batch)

    return seen_filter


class ContainsRouter:
    """map_batches-side READ-ONLY membership probe against a shard pool
    (the fetched-set anti-join): routes a hash batch to its owning shards,
    one ``contains`` RPC per shard per batch, no mutation.  Replaces the
    round-2 pattern of re-``ray.put``-ing a driver-side removed-set every
    round — the state lives in the shards; tasks ship only the handles."""

    def __init__(self, shard_handles):
        self.shards = shard_handles
        self.n = len(shard_handles)

    def contains_mask(self, hashes: list[str]) -> np.ndarray:
        per_fp, per_idx = route_hashes(hashes, self.n)
        futures = {
            s: self.shards[s].contains.remote(per_fp[s])
            for s in range(self.n)
            if per_fp[s]
        }
        out = np.zeros(len(hashes), dtype=bool)
        for s, fut in futures.items():
            out[np.array(per_idx[s])] = ray.get(fut)
        return out


class SeenRouter:
    """map_batches-callable: keeps only rows whose url_hash is globally new,
    registering them in the shard pool as a side effect.

    Rows within one batch must already be hash-unique (the pipeline dedups
    per round *before* this stage so the min-depth merge rule stays
    deterministic regardless of batch/task interleaving).
    """

    def __init__(self, shard_handles):
        self.shards = shard_handles
        self.n = len(shard_handles)

    def __call__(self, batch):
        import pyarrow as pa

        hashes = batch["url_hash"].to_pylist()
        per_fp, per_idx = route_hashes(hashes, self.n)
        futures = {
            s: self.shards[s].add_if_new.remote(per_fp[s])
            for s in range(self.n)
            if per_fp[s]
        }
        keep = np.zeros(len(hashes), dtype=bool)
        for s, fut in futures.items():
            keep[np.array(per_idx[s])] = ray.get(fut)
        return batch.filter(pa.array(keep))


class AddRouter:
    """map_batches-side WRITE-ONLY registration into a shard pool (the
    fetched-set bookkeeping): routes a hash batch to its owning shards,
    one ``add_if_new`` RPC per shard per batch, result ignored.  The
    ``ray.get`` barrier inside the task guarantees every add has landed
    before the round's bookkeeping execution is considered complete —
    the driver never sees the hashes at all."""

    def __init__(self, shard_handles):
        self.shards = shard_handles
        self.n = len(shard_handles)

    def add(self, hashes: list[str]) -> None:
        per_fp, _ = route_hashes(hashes, self.n)
        futures = [
            self.shards[s].add_if_new.remote(per_fp[s])
            for s in range(self.n)
            if per_fp[s]
        ]
        if futures:
            ray.get(futures)
