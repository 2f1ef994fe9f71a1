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

Vectorized at the Arrow level: list offsets + flattened child arrays,
masks + bincounts over a repeated row-id, list rebuilds + binary_join for
the concatenations.  The only per-row Python left is one md5 call per doc
in ``span_sig_batch`` (the digest itself).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _grouped_list(
    child: pa.Array, row_id: np.ndarray, n_rows: int
) -> tuple[pa.ListArray, np.ndarray]:
    """Rebuild a list array grouping ``child`` values by their source row
    (row_id ascending — span order within each row is preserved)."""
    counts = np.bincount(row_id, minlength=n_rows).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return (
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), child),
        counts,
    )


def flatten_spans_batch(batch: pa.Table) -> pa.Table:
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    flat = spans.flatten()  # struct array of all spans
    n = len(lengths)
    row_id = np.repeat(np.arange(n, dtype=np.int64), lengths)
    kinds = flat.field("kind")
    is_text = pc.fill_null(pc.equal(kinds, "text"), False)
    is_media = pc.fill_null(
        pc.is_in(kinds, value_set=pa.array(["image", "audio"])), False
    )
    t_mask = is_text.to_numpy(zero_copy_only=False)
    m_mask = is_media.to_numpy(zero_copy_only=False)
    # text spans re-grouped per doc and joined in span order — one Arrow
    # kernel each, no per-doc Python
    t_list, n_text = _grouped_list(
        pc.fill_null(flat.field("text").filter(is_text), ""), row_id[t_mask], n
    )
    out_text = pc.binary_join(t_list, " ")
    m_list, n_media = _grouped_list(
        flat.field("media_ref").filter(is_media), row_id[m_mask], n
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text": out_text,
            "media_refs": m_list.cast(pa.list_(pa.string())),
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
    bounds = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    # per-span "kind\x1ftext\x1fref\x1foffset" strings + per-doc "\x1e"
    # join in Arrow kernels; the only Python loop is one md5 per DOC
    # (empty-or-None text/ref both map to '' like the original `x or ''`)
    parts = pc.binary_join_element_wise(
        flat.field("kind"),
        pc.fill_null(flat.field("text"), ""),
        pc.fill_null(flat.field("media_ref"), ""),
        pc.cast(flat.field("offset"), pa.string()),
        "\x1f",
    )
    doc_str = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(bounds, pa.int32()), parts), "\x1e"
    )
    sigs = [
        hashlib.md5(s.as_py().encode()).hexdigest() for s in doc_str
    ]
    return pa.table({"doc_id": batch["doc_id"], "span_sig": pa.array(sigs, pa.string())})


def span_stats_batch(batch: pa.Table) -> pa.Table:
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    flat = spans.flatten()
    kinds = flat.field("kind")
    offs = flat.field("offset").to_numpy(zero_copy_only=False)
    n = len(lengths)
    row_id = np.repeat(np.arange(n, dtype=np.int64), lengths)
    kind_names = ("text", "image", "audio", "link")
    cols = {"doc_id": batch["doc_id"], "n_spans": pa.array(lengths.astype(np.int64))}
    for k in kind_names:
        mask = pc.fill_null(pc.equal(kinds, k), False).to_numpy(zero_copy_only=False)
        cols[f"n_{k}"] = pa.array(
            np.bincount(row_id[mask], minlength=n).astype(np.int64), pa.int64()
        )
    # a doc is non-monotonic iff any WITHIN-doc adjacent offset pair fails
    if len(offs) > 1:
        same_doc = row_id[1:] == row_id[:-1]
        viol = same_doc & (np.diff(offs) <= 0)
        bad = np.bincount(row_id[1:][viol], minlength=n) > 0
    else:
        bad = np.zeros(n, bool)
    cols["offsets_monotonic"] = pa.array(~bad, pa.bool_())
    return pa.table(cols)


def flatten_spans(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(flatten_spans_batch, batch_format="pyarrow")
