"""Greedy sequence packing (token-budget bin packing) for LLM training.

Documents are packed into fixed-token-budget training sequences with the
deterministic, shard-parallel layout real pipelines use: packing is
defined PER BUCKET (``bucket = doc_id // bucket_size``), so every bucket
packs independently of every other — a 100-TB corpus packs
embarrassingly parallel, adding documents only ever changes the buckets
they land in, and the result is independent of block layout (the
determinism a whole-corpus greedy scan cannot give you at scale).

Within a bucket: docs in doc_id order, next-fit — a doc joins the
current sequence unless that would exceed ``budget`` tokens, else it
opens the next sequence.  An oversized doc (> budget) gets a sequence of
its own (real pipelines then truncate/split downstream; the assignment
layer keeps it whole).

Scale shape: token counts come from the vectorized token_count kernel;
one ``groupby(bucket)`` exchange carrying (doc_id, bucket, n_tokens) —
never text; the per-bucket scan is O(bucket size) integer work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from anansi_ray.arrowds import drop_empty_blocks as _drop_empty_blocks
from anansi_ray.functions.text import token_count_batch

PACK_BUDGET = 512
PACK_BUCKET = 64


def pack_bucket_ids(
    ids: np.ndarray, toks: np.ndarray, budget: int
) -> tuple[np.ndarray, np.ndarray]:
    """Next-fit over docs already sorted by id: returns (seq_idx, offset)
    per doc — seq_idx is the sequence ordinal within the bucket, offset
    the doc's token start inside its sequence."""
    n = len(ids)
    seq = np.zeros(n, dtype=np.int64)
    off = np.zeros(n, dtype=np.int64)
    cur_seq = 0
    cur_fill = 0
    for i in range(n):
        t = int(toks[i])
        if cur_fill > 0 and cur_fill + t > budget:
            cur_seq += 1
            cur_fill = 0
        seq[i] = cur_seq
        off[i] = cur_fill
        cur_fill += t
    return seq, off


def pack_sequences(
    docs: rd.Dataset,
    *,
    budget: int = PACK_BUDGET,
    bucket_size: int = PACK_BUCKET,
) -> rd.Dataset:
    """(doc_id, text) Dataset → (doc_id, bucket, seq_idx, offset, n_tokens).

    ``seq_idx`` is bucket-local; (bucket, seq_idx) names a training
    sequence globally."""

    def measure(batch: pa.Table) -> pa.Table:
        t = token_count_batch(batch)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(ids // bucket_size, pa.int64()),
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
            }
        )

    def pack(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "seq_idx": pa.array([], pa.int64()),
                    "offset": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        import pyarrow.compute as pc

        g = group.take(pc.sort_indices(group, sort_keys=[("doc_id", "ascending")]))
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        toks = g["n_tokens"].to_numpy(zero_copy_only=False)
        seq, off = pack_bucket_ids(ids, toks, budget)
        return pa.table(
            {
                "bucket": g["bucket"],
                "doc_id": g["doc_id"],
                "seq_idx": pa.array(seq, pa.int64()),
                "offset": pa.array(off, pa.int64()),
                "n_tokens": g["n_tokens"],
            }
        )

    out = (
        docs.map_batches(measure, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack, batch_format="pyarrow")
    )
    return _drop_empty_blocks(out.materialize())
