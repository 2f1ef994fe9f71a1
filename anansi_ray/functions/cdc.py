"""Content-defined chunking (CDC) dedup over binary media payloads —
the rsync/LBFS/backup-store recipe (Muthitacharoen et al. 2001, "A
Low-bandwidth Network File System") applied to a crawl's media corpus:
split every payload at content-determined boundaries (a rolling-hash
condition), hash each chunk, and count how many stored bytes survive
chunk-level dedup.  Catches sub-object duplication (shared prefixes,
re-encoded variants, repeated segments) that whole-payload hashing
(media_payload_dedup) cannot see.

Determinism: boundaries are every position whose 16-byte rolling
polynomial hash (base 31, mod 2⁶⁴ via native uint64 wraparound) is
divisible by 64 — a pure per-byte condition with NO sequential state
(no min-chunk clamp), so the chunking is exactly reproducible anywhere
and the sequential twin is bit-identical.  The rolling hash itself is
fully vectorized: H[i] = 31·H[i-1] + b[i] is computed in closed form as
31^i · Σ b[j]·31^(-j) with precomputed (inverse-)power tables — no
per-byte Python.

Scale shape: payload bytes NEVER shuffle — each batch chunks and hashes
locally and forwards only (chunk_md5, size, count) combiner rows; ONE
coarse hash exchange on the 128-bit chunk key; the final stats row is a
tiny driver reduction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

CDC_W = 16        # rolling-hash window (bytes)
CDC_MASK = 64     # boundary where window hash % CDC_MASK == 0 (~64 B chunks)

_BASE = np.uint64(31)
_INV31 = np.uint64(pow(31, -1, 1 << 64))


def cdc_boundaries(data: bytes) -> np.ndarray:
    """Positions i (cut AFTER byte i) where the 16-byte window hash is
    divisible by CDC_MASK; always includes the payload end."""
    n = len(data)
    if n <= CDC_W:
        return np.array([n - 1], np.int64) if n else np.array([], np.int64)
    b = np.frombuffer(data, np.uint8).astype(np.uint64)
    # power tables p[i] = 31^i, ip[i] = 31^-i (mod 2^64 via uint64 wrap)
    p = np.multiply.accumulate(np.full(n, _BASE, np.uint64))
    p = np.concatenate([[np.uint64(1)], p[:-1]])
    ip = np.multiply.accumulate(np.full(n, _INV31, np.uint64))
    ip = np.concatenate([[np.uint64(1)], ip[:-1]])
    S = np.cumsum(b * ip, dtype=np.uint64)
    H = p * S
    # window hash over [i-W+1, i]: H[i] - 31^W * H[i-W]
    powW = p[CDC_W] if CDC_W < n else np.uint64(pow(31, CDC_W, 1 << 64))
    wh = H[CDC_W:] - powW * H[:-CDC_W]
    cut = np.flatnonzero(wh % np.uint64(CDC_MASK) == 0) + CDC_W
    if len(cut) == 0 or cut[-1] != n - 1:
        cut = np.concatenate([cut, [n - 1]])
    return cut.astype(np.int64)


def chunk_payload(data: bytes) -> list[bytes]:
    cuts = cdc_boundaries(data)
    out, start = [], 0
    for c in cuts:
        out.append(data[start : c + 1])
        start = c + 1
    return out


def chunk_stats_partial(batch: pa.Table, payload_col: str = "payload") -> pa.Table:
    """Per-batch combiner: (chunk md5, size, count) rows — chunks are
    hashed and pre-aggregated block-locally; the payload bytes stay put."""
    agg: dict[str, list] = {}
    for payload in batch[payload_col].to_pylist():
        data = bytes(payload or b"")
        for ch in chunk_payload(data):
            k = hashlib.md5(ch).hexdigest()
            if k in agg:
                agg[k][1] += 1
            else:
                agg[k] = [len(ch), 1]
    keys = sorted(agg)
    return pa.table(
        {
            "chunk": pa.array(keys, pa.string()),
            "size": pa.array([agg[k][0] for k in keys], pa.int64()),
            "cnt": pa.array([agg[k][1] for k in keys], pa.int64()),
        }
    )


def _stats_row(chunks: pa.Table) -> pa.Table:
    size = chunks["size"].to_numpy(zero_copy_only=False)
    cnt = chunks["cnt"].to_numpy(zero_copy_only=False)
    total = int((size * cnt).sum())
    uniq_bytes = int(size.sum())
    return pa.table(
        {
            "n_chunks": pa.array([int(cnt.sum())], pa.int64()),
            "n_unique": pa.array([len(size)], pa.int64()),
            "bytes_total": pa.array([total], pa.int64()),
            "bytes_unique": pa.array([uniq_bytes], pa.int64()),
            "dedup_ratio": pa.array(
                [round(uniq_bytes / total, 6) if total else 0.0], pa.float64()
            ),
        }
    )


def cdc_dedup_distributed(ds: rd.Dataset, payload_col: str = "payload") -> pa.Table:
    from anansi_ray.arrowds import coarse_agg

    merged = coarse_agg(
        ds.map_batches(
            lambda b: chunk_stats_partial(b, payload_col), batch_format="pyarrow"
        ),
        "chunk",
        {"size": ("min", "size"), "cnt": ("sum", "cnt")},
    ).to_pandas()
    if len(merged) == 0:
        return _stats_row(
            pa.table(
                {"size": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        )
    return _stats_row(pa.Table.from_pandas(merged, preserve_index=False))


def cdc_dedup_local(tbl: pa.Table, payload_col: str = "payload") -> pa.Table:
    """Sequential twin: one chunk_stats_partial slice is already the
    global (chunk, size, count) table."""
    return _stats_row(chunk_stats_partial(tbl, payload_col))
