"""BM25 top-k retrieval over the documents table (Robertson/Okapi BM25,
the classic probabilistic ranking function used to mine-and-rank training
corpora for LLM pipelines — e.g. retrieval-based data selection).

Shape at 100 TB: the query vocabulary is tiny, so NOTHING shuffles —
pass 1 reduces each batch to one stats row (n_docs, total token length,
per-term document frequency) merged on the driver; pass 2 broadcasts
those corpus stats and streams the corpus once more, scoring each batch
vectorized and forwarding only a per-query partial top-k.  Driver
traffic is O(n_blocks · nq · k) rows.

Determinism contract (full DuckDB value oracle — SQL_BM25_TOPK in
pipelines/queries.py recomputes everything independently): tokens are
``[a-z0-9]+`` runs of the lowercased text (both engines use their own
regex engine on the same pattern); scores are IEEE-double BM25 with the
(k1+1) numerator, rounded to ``BM25_ROUND`` decimals BEFORE ranking;
ranking order is (rounded score desc, doc_id asc); only docs containing
at least one query term (score > 0) are candidates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
BM25_ROUND = 6

# fixed query term lists (deterministic, corpus-independent)
BM25_QUERIES: dict[int, tuple[str, ...]] = {
    1: ("hash", "join", "merge"),
    2: ("window", "sort", "order"),
    3: ("stream", "batch", "data"),
}

_VOCAB = tuple(sorted({t for ts in BM25_QUERIES.values() for t in ts}))

OUT_SPEC = {
    "query_id": pa.int64(),
    "rank": pa.int64(),
    "doc_id": pa.int64(),
    "score": pa.float64(),
}


def _empty_out() -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in OUT_SPEC.items()})


def _doc_term_counts(batch: pa.Table):
    """Vectorized per-doc token length + per-vocab-term tf matrix.

    One Arrow regex split over the whole batch; the flat token array is
    matched against the (tiny) vocabulary with numpy — no per-row Python.
    """
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
    nonempty = flat != ""
    flat, parents = flat[nonempty], parents[nonempty]
    dl = np.bincount(parents, minlength=n).astype(np.float64)
    tf = np.zeros((n, len(_VOCAB)), np.float64)
    for ti, term in enumerate(_VOCAB):
        hit = flat == term
        if hit.any():
            tf[:, ti] = np.bincount(parents[hit], minlength=n)
    return dl, tf


def _stats_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one row of (n_docs, total_len, df per term)."""
    dl, tf = _doc_term_counts(batch)
    return pa.table(
        {
            "n_docs": pa.array([batch.num_rows], pa.int64()),
            "total_len": pa.array([float(dl.sum())], pa.float64()),
            "df": pa.array([list((tf > 0).sum(axis=0).astype(np.float64))],
                           pa.list_(pa.float64())),
        }
    )


def bm25_topk(
    ds: rd.Dataset, k: int = BM25_TOPK, id_col: str = "doc_id"
) -> pa.Table:
    """Two streaming passes: corpus stats (tiny partials) → broadcast →
    vectorized scoring with per-batch partial top-k → driver rank merge."""
    ds = ds.materialize()
    stats = ds.map_batches(_stats_partial, batch_format="pyarrow").to_pandas()
    if len(stats) == 0 or stats["n_docs"].sum() == 0:
        return _empty_out()
    n_total = float(stats["n_docs"].sum())
    avgdl = float(stats["total_len"].sum()) / n_total
    df = np.sum(np.stack([np.asarray(x, np.float64) for x in stats["df"]]), axis=0)
    idf = np.log((n_total - df + 0.5) / (df + 0.5) + 1.0)

    # per-query (vocab-index, idf) selections — tiny broadcast state
    q_ids = sorted(BM25_QUERIES)
    q_sel = [
        np.array([_VOCAB.index(t) for t in BM25_QUERIES[q]], np.int64)
        for q in q_ids
    ]
    bref = ray.put((avgdl, idf, q_ids, q_sel))

    def score_partial(batch: pa.Table) -> pa.Table:
        avgdl_, idf_, q_ids_, q_sel_ = ray.get(bref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dl, tf = _doc_term_counts(batch)
        denom_dl = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl_)
        out_q, out_d, out_s = [], [], []
        for qi, sel in zip(q_ids_, q_sel_):
            # fixed term order: sum per-term contributions left to right
            s = np.zeros(len(ids))
            for ti in sel:
                t = tf[:, ti]
                s = s + idf_[ti] * (t * (BM25_K1 + 1.0)) / (t + denom_dl)
            s = np.round(s, BM25_ROUND)
            pos = np.flatnonzero(s > 0)
            if len(pos) == 0:
                continue
            order = pos[np.lexsort((ids[pos], -s[pos]))[:k]]
            out_q.append(np.full(len(order), qi, np.int64))
            out_d.append(ids[order])
            out_s.append(s[order])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    parts = ds.map_batches(score_partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return _empty_out()
    q = parts["query_id"].to_numpy(dtype=np.int64)
    d = parts["doc_id"].to_numpy(dtype=np.int64)
    s = parts["score"].to_numpy(dtype=np.float64)
    order = np.lexsort((d, -s, q))
    q, d, s = q[order], d[order], s[order]
    newq = np.r_[True, q[1:] != q[:-1]]
    idx = np.arange(len(q))
    start = np.maximum.accumulate(np.where(newq, idx, 0))
    rank = idx - start + 1
    keep = rank <= k
    return pa.table(
        {
            "query_id": pa.array(q[keep], pa.int64()),
            "rank": pa.array(rank[keep], pa.int64()),
            "doc_id": pa.array(d[keep], pa.int64()),
            "score": pa.array(s[keep], pa.float64()),
        }
    )
