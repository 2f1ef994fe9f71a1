"""Compact cuckoo filter for the URL-seen set (ST1 scale path).

The exact-set shards (state/seen.py) cost ~16 B/URL plus python-set
overhead; at a 10^10-URL frontier that is the dominant memory consumer.
This cuckoo filter stores 16-bit fingerprints in 4-slot buckets
(2.1-4.4 B/URL depending on power-of-two rounding) with a false-positive
rate ≈ 2^-13 per probe —
a false positive drops a genuinely-new URL, so the engine treats the
cuckoo backend as the *approximate* option (sampling-audited in
production designs) and keeps the exact backend for conformance runs;
both implement the same ``add_if_new`` contract.

Pure numpy; the URL cache key's own bits supply fingerprint and index
(the key is already uniform SHA-256 — cache.c:103-129 — so no rehash).
"""

from __future__ import annotations

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500


#: standard cuckoo-filter stash: kick-exhausted victims park here instead of
#: being dropped (which would create FALSE NEGATIVES — an already-seen URL
#: passing add_if_new and being re-crawled).  A handful of entries suffices
#: at 95% load; beyond this the filter reports over-full and the owning
#: shard falls back to exact storage.
_MAX_STASH = 64

#: 64-bit odd mixing constant for the partner-index hash of a fingerprint
#: (plain Python ints — numpy uint64 scalar multiplies emit overflow
#: RuntimeWarnings even though wraparound is intended)
_MIX = 0x9E3779B97F4A7C15
_MASK64 = (1 << 64) - 1


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 42):
        n_buckets = 1
        while n_buckets * _SLOTS < capacity / 0.95:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.default_rng(seed)
        #: (bucket_index, fingerprint) pairs whose insertion exhausted the
        #: kick budget; membership checks consult this alongside the table
        self.stash: set[tuple[int, int]] = set()

    # -- key decomposition ------------------------------------------------
    def _parts(self, url_hash_hex: str) -> tuple[int, int]:
        """fingerprint (16-bit, never 0) and primary index from the key's
        own SHA-256 bits."""
        fp = int(url_hash_hex[:4], 16) or 1
        i1 = int(url_hash_hex[4:12], 16) & (self.n_buckets - 1)
        return fp, i1

    def _partner(self, i: int, fp: int) -> int:
        h = ((fp * _MIX) & _MASK64) >> 32
        return (i ^ h) & (self.n_buckets - 1)

    # -- single-item ops --------------------------------------------------
    def contains(self, url_hash_hex: str) -> bool:
        fp, i1 = self._parts(url_hash_hex)
        i2 = self._partner(i1, fp)
        if (self.table[i1] == fp).any() or (self.table[i2] == fp).any():
            return True
        # a stashed victim's recorded index is one of ITS buckets, which for
        # an equal fingerprint is one of {i1, i2} (partner() is an involution)
        return bool(self.stash) and (
            (i1, fp) in self.stash or (i2, fp) in self.stash
        )

    def add(self, url_hash_hex: str) -> bool:
        """Insert; returns False only if the filter is over-full (table AND
        stash exhausted)."""
        fp, i1 = self._parts(url_hash_hex)
        i2 = self._partner(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        if len(self.stash) >= _MAX_STASH:
            # over-full: refuse WITHOUT kicking — an eviction chain that
            # cannot park its final victim would silently lose a
            # previously-inserted key (a false negative); refusing only
            # drops the NEW key, the documented false-positive direction
            return False
        # cuckoo kicks
        i = i1 if self._rng.integers(0, 2) else i2
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(0, _SLOTS))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._partner(i, fp)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # kick budget exhausted: park the last evicted victim in the stash
        # so no previously-inserted key ever reads as absent (capacity was
        # reserved above)
        self.stash.add((i, fp))
        self.count += 1
        return True

    def add_if_new(self, url_hashes: list[str]) -> np.ndarray:
        """Same contract as the exact shard: True where newly inserted.
        May return False for a genuinely-new key (false positive, p≈2^-13)."""
        out = np.zeros(len(url_hashes), dtype=bool)
        for j, h in enumerate(url_hashes):
            if not self.contains(h):
                out[j] = self.add(h)
        return out

    # -- persistence ------------------------------------------------------
    def dump(self) -> bytes:
        # layout: [uint64 n_stash][n_stash × (uint64 idx, uint64 fp)][table]
        head = np.array([len(self.stash)], dtype=np.uint64).tobytes()
        stash = np.array(sorted(self.stash), dtype=np.uint64).tobytes()
        return head + stash + self.table.tobytes()

    def restore(self, blob: bytes) -> None:
        n_stash = int(np.frombuffer(blob[:8], dtype=np.uint64)[0])
        off = 8 + n_stash * 16
        pairs = np.frombuffer(blob[8:off], dtype=np.uint64).reshape(-1, 2)
        self.stash = {(int(i), int(fp)) for i, fp in pairs}
        self.table = np.frombuffer(blob[off:], dtype=np.uint16).reshape(
            -1, _SLOTS
        ).copy()
        self.n_buckets = self.table.shape[0]
        self.count = int((self.table != 0).sum()) + len(self.stash)

    @property
    def bytes_used(self) -> int:
        return self.table.nbytes
