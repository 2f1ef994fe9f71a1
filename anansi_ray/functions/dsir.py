"""DSIR importance weights (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling"): score every corpus document by the
log-likelihood ratio between a TARGET domain's hashed n-gram distribution
and the RAW corpus distribution — the standard recipe for selecting
pretraining data that "looks like" a target domain.

Features are unigrams + adjacent bigrams of ``[a-z0-9]+`` tokens, hashed
into ``DSIR_NB`` buckets (md5 → first 8 hex digits → mod NB, a contract
DuckDB reproduces exactly: ``('0x' || substr(md5(f),1,8))::UBIGINT``).
Both bucket distributions get Laplace smoothing (+1 / +NB) before the
per-bucket log-ratio λ; a document's importance log-weight is the sum of
λ over its feature instances.

Shape at 100 TB: the feature space is FIXED (NB buckets), so pass 1
reduces each batch to two NB-vectors (target/raw bucket counts) merged
driver-side — O(blocks · NB) driver traffic, no shuffle; pass 2
broadcasts λ and streams the corpus once more, scoring each doc with one
``np.bincount`` over its feature instances.  The only per-item Python is
one md5 per DISTINCT feature string per batch (memoized via np.unique),
matching the hashed-feature contract the SQL twin can verify.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

DSIR_NB = 1024
DSIR_TARGET_LANG = "en"
DSIR_ROUND = 6

OUT_SPEC = {
    "doc_id": pa.int64(),
    "n_feats": pa.int64(),
    "logw": pa.float64(),
}


def _empty_out() -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in OUT_SPEC.items()})


def _features(batch: pa.Table):
    """Per-doc feature-instance buckets: (parents, buckets, per-doc
    feature counts).  Unigrams + adjacent bigrams, md5-bucketed with one
    hash per DISTINCT string (np.unique memo)."""
    n = batch.num_rows
    toks = pc.split_pattern_regex(
        pc.utf8_lower(
            pc.fill_null(batch["text"].combine_chunks().cast(pa.string()), "")
        ),
        "[^a-z0-9]+",
    )
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(str)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    parents = np.repeat(np.arange(n), lens)
    keep = flat != ""
    flat, parents = flat[keep], parents[keep]
    # adjacent bigrams within the same doc
    if len(flat) > 1:
        same = parents[1:] == parents[:-1]
        big = np.char.add(np.char.add(flat[:-1][same], " "), flat[1:][same])
        big_parents = parents[:-1][same]
    else:
        big = np.array([], str)
        big_parents = np.array([], np.int64)
    feats = np.concatenate([flat, big])
    fparents = np.concatenate([parents, big_parents]).astype(np.int64)
    uniq, inv = np.unique(feats, return_inverse=True)
    ubuck = np.array(
        [int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % DSIR_NB for u in uniq],
        np.int64,
    )
    buckets = ubuck[inv] if len(feats) else np.array([], np.int64)
    nfeats = np.bincount(fparents, minlength=n).astype(np.int64)
    return fparents, buckets, nfeats


def dsir_weights(
    ds: rd.Dataset,
    target_lang: str = DSIR_TARGET_LANG,
    id_col: str = "doc_id",
) -> pa.Table:
    """Two streaming passes: bucket-count partials (two NB-vectors per
    batch) → smoothed log-ratio broadcast → per-doc scoring."""
    ds = ds.materialize()

    def count_partial(batch: pa.Table) -> pa.Table:
        fparents, buckets, _ = _features(batch)
        is_tgt = pc.equal(
            batch["lang"].combine_chunks().cast(pa.string()), target_lang
        ).to_numpy(zero_copy_only=False)
        raw = np.bincount(buckets, minlength=DSIR_NB).astype(np.float64)
        tmask = is_tgt[fparents] if len(fparents) else np.array([], bool)
        tgt = np.bincount(buckets[tmask], minlength=DSIR_NB).astype(np.float64)
        return pa.table(
            {
                "raw": pa.array([list(raw)], pa.list_(pa.float64())),
                "tgt": pa.array([list(tgt)], pa.list_(pa.float64())),
            }
        )

    stats = ds.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    if len(stats) == 0:
        return _empty_out()
    raw = np.sum(np.stack([np.asarray(x, np.float64) for x in stats["raw"]]), axis=0)
    tgt = np.sum(np.stack([np.asarray(x, np.float64) for x in stats["tgt"]]), axis=0)
    lam = np.log((tgt + 1.0) / (tgt.sum() + DSIR_NB)) - np.log(
        (raw + 1.0) / (raw.sum() + DSIR_NB)
    )
    lref = ray.put(lam)

    def score(batch: pa.Table) -> pa.Table:
        lam_ = ray.get(lref)
        fparents, buckets, nfeats = _features(batch)
        n = batch.num_rows
        logw = (
            np.bincount(fparents, weights=lam_[buckets], minlength=n)
            if len(fparents)
            else np.zeros(n)
        )
        return pa.table(
            {
                "doc_id": batch[id_col].cast(pa.int64()),
                "n_feats": pa.array(nfeats, pa.int64()),
                "logw": pa.array(np.round(logw, DSIR_ROUND), pa.float64()),
            }
        )

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)
