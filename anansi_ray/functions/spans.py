"""Interleaved-span document operators (the input_hint payload axis).

The crawl emits documents as ordered interleaved spans
``list<struct<kind,text,media_ref,offset>>`` (BASELINE.json input_hint).
These operators bridge that shape into the training-data pipeline:

* ``flatten_spans_batch`` — (doc_id, spans) → (doc_id, text, media_refs,
  n_spans, n_text_spans, n_media_spans): text spans concatenated in span
  order, media refs collected in order.  Downstream text ops (dedup,
  quality, lang-ID, fingerprints) then run unchanged on the flattened
  text; media refs feed the multimodal feature stage.
* ``span_stats_batch`` — per-document span-shape statistics (the per-row
  invariant surface: kind histogram, offset monotonicity check).

Vectorized at the Arrow level: list offsets + flattened child arrays, no
per-row python except the final string join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def flatten_spans_batch(batch: pa.Table) -> pa.Table:
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    flat = spans.flatten()  # struct array of all spans
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    refs = flat.field("media_ref").to_pylist()
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)

    out_text, out_refs, n_text, n_media = [], [], [], []
    for i in range(len(lengths)):
        s, e = offsets[i], offsets[i + 1]
        t_parts = [texts[j] for j in range(s, e) if kinds[j] == "text"]
        m_parts = [refs[j] for j in range(s, e) if kinds[j] in ("image", "audio")]
        out_text.append(" ".join(t_parts))
        out_refs.append(m_parts)
        n_text.append(len(t_parts))
        n_media.append(len(m_parts))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text": pa.array(out_text, pa.string()),
            "media_refs": pa.array(out_refs, pa.list_(pa.string())),
            "n_spans": pa.array(lengths.astype(np.int64), pa.int64()),
            "n_text_spans": pa.array(n_text, pa.int64()),
            "n_media_spans": pa.array(n_media, pa.int64()),
        }
    )


def span_sig_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, span_sig): md5 over the ORDERED span sequence
    (kind, text, media_ref, offset) — the per-row span-sequence invariant
    (BASELINE.json input_hint) as a hash-comparable scalar.  Shared
    per-record math between the pipeline query and the reference-crawl
    oracle side table (independent orchestration, same digest)."""
    import hashlib

    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    flat = spans.flatten()
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    refs = flat.field("media_ref").to_pylist()
    offs = flat.field("offset").to_pylist()
    bounds = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
    sigs = []
    for i in range(len(lengths)):
        s, e = bounds[i], bounds[i + 1]
        parts = [
            f"{kinds[j]}\x1f{texts[j] or ''}\x1f{refs[j] or ''}\x1f{offs[j]}"
            for j in range(s, e)
        ]
        sigs.append(hashlib.md5("\x1e".join(parts).encode()).hexdigest())
    return pa.table({"doc_id": batch["doc_id"], "span_sig": pa.array(sigs, pa.string())})


def span_stats_batch(batch: pa.Table) -> pa.Table:
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    flat = spans.flatten()
    kinds = flat.field("kind").to_pylist()
    offs = flat.field("offset").to_numpy(zero_copy_only=False)
    bounds = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
    kind_names = ("text", "image", "audio", "link")
    counts = {k: [] for k in kind_names}
    monotonic = []
    for i in range(len(lengths)):
        s, e = bounds[i], bounds[i + 1]
        seg = kinds[s:e]
        for k in kind_names:
            counts[k].append(seg.count(k))
        o = offs[s:e]
        monotonic.append(bool(np.all(np.diff(o) > 0)) if e - s > 1 else True)
    cols = {"doc_id": batch["doc_id"], "n_spans": pa.array(lengths.astype(np.int64))}
    for k in kind_names:
        cols[f"n_{k}"] = pa.array(counts[k], pa.int64())
    cols["offsets_monotonic"] = pa.array(monotonic, pa.bool_())
    return pa.table(cols)


def flatten_spans(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(flatten_spans_batch, batch_format="pyarrow")
