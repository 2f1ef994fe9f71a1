"""BPE vocabulary induction (Sennrich et al., 2016 — "Neural Machine
Translation of Rare Words with Subword Units") over the corpus.

The tokenizer-training member of the LLM-pipeline family: learn the
merge table that a byte-pair-encoding tokenizer would use, from corpus
word frequencies.  Standard practice (and the only shape that scales)
is to train on the WORD-FREQUENCY table, not the raw corpus: the
corpus-scale work is exactly one distributed counting pass —

* per-batch word value-counts combiner (shuffle carries per-batch
  vocabularies, never the token stream),
* ONE coarse hash exchange (`arrowds.coarse_agg`) summing per-word
  counts,
* a per-block partial top-V / tiny driver merge (deterministic
  ``(count DESC, word ASC)`` order) bounding the merge loop's input —

after which the merge loop itself runs on the bounded V-row table in
O(V · word_len) per merge, independent of corpus size.

Determinism: the top-V cut and every merge choice tie-break
lexicographically, so the merge table is a pure function of the word
counts — the oracle builder recomputes the counts INDEPENDENTLY in
DuckDB and runs the same pure merge loop (the house twin pattern:
shared kernel, independent orchestration + independent counting).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BPE_TOP_WORDS = 512
BPE_MERGES = 30

OUT_SPEC = {
    "merge_rank": pa.int64(),
    "left": pa.string(),
    "right": pa.string(),
    "merged": pa.string(),
    "pair_count": pa.int64(),
}


def empty_out() -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in OUT_SPEC.items()})


def top_words(pairs: list[tuple[str, int]], v: int = BPE_TOP_WORDS):
    """Deterministic top-V cut: (count DESC, word ASC)."""
    return sorted(pairs, key=lambda p: (-p[1], p[0]))[:v]


def bpe_merge_loop(
    word_counts: list[tuple[str, int]], n_merges: int = BPE_MERGES
) -> pa.Table:
    """The pure merge loop (shared by the distributed query and the
    oracle twin).  ``word_counts`` is the bounded top-V table; symbols
    start as single characters; each round merges the globally most
    frequent adjacent pair (ties → lexicographically smallest (left,
    right)) and records it."""
    words = [(tuple(w), int(c)) for w, c in word_counts if len(w) > 0]
    ranks, lefts, rights, mergeds, counts = [], [], [], [], []
    for rank in range(1, n_merges + 1):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), pc_ = best
        merged = l + r
        new_words = []
        for syms, c in words:
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((tuple(out), c))
        words = new_words
        ranks.append(rank)
        lefts.append(l)
        rights.append(r)
        mergeds.append(merged)
        counts.append(pc_)
    return pa.table(
        {
            "merge_rank": pa.array(ranks, pa.int64()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "merged": pa.array(mergeds, pa.string()),
            "pair_count": pa.array(counts, pa.int64()),
        }
    )


def word_count_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch combiner: word value-counts (the shuffle then carries
    per-batch vocabularies, not the token stream)."""
    import pandas as pd
    import pyarrow.compute as pc

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = (
        pc.list_flatten(
            pc.split_pattern(pc.fill_null(pc.cast(col, pa.string()), ""), " ")
        )
        .to_pandas()
        .to_numpy(dtype=object)
    )
    s = pd.Series(words, dtype=object)
    vc = s[s != ""].value_counts()
    return pa.table(
        {
            "word": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
            "cnt": pa.array(vc.to_numpy().astype(np.int64), pa.int64()),
        }
    )


def topv_partial(batch: pa.Table, v: int = BPE_TOP_WORDS) -> pa.Table:
    """Per-block partial top-V by (cnt DESC, word ASC) — each block
    forwards ≤ V rows to the driver merge."""
    w = batch["word"].to_numpy(zero_copy_only=False)
    c = batch["cnt"].to_numpy(zero_copy_only=False)
    order = np.lexsort((w, -c))[:v]
    return pa.table(
        {
            "word": pa.array(w[order], pa.string()),
            "cnt": pa.array(c[order].astype(np.int64), pa.int64()),
        }
    )


def encode_word(word: str, merges: list[tuple[str, str]]) -> int:
    """Apply the trained merge table to one word (merges in rank order,
    each scanning left-to-right — the exact application rule of the
    training loop) and return its piece count."""
    syms = list(word)
    for l, r in merges:
        if len(syms) < 2:
            break
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def bpe_encode_batch(
    batch: pa.Table, merges: list[tuple[str, str]], id_col: str = "doc_id"
) -> pa.Table:
    """Per-doc encode stats under a broadcast merge table: (doc_id,
    n_words, n_pieces, ratio).  One encode per DISTINCT word per batch
    (np.unique memo); everything else is vectorized bincount."""
    import pyarrow.compute as pc

    n = batch.num_rows
    words = pc.split_pattern(
        pc.fill_null(batch["text"].combine_chunks().cast(pa.string()), ""),
        " ",
    )
    flat = words.flatten().to_numpy(zero_copy_only=False).astype(str)
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    parents = np.repeat(np.arange(n), lens)
    keep = flat != ""
    flat, parents = flat[keep], parents[keep]
    uniq, inv = np.unique(flat, return_inverse=True)
    pieces_u = np.array([encode_word(u, merges) for u in uniq], np.int64)
    n_words = np.bincount(parents, minlength=n).astype(np.int64)
    n_pieces = (
        np.bincount(parents, weights=pieces_u[inv].astype(np.float64), minlength=n)
        .astype(np.int64)
        if len(flat)
        else np.zeros(n, np.int64)
    )
    ratio = np.round(
        np.divide(
            n_pieces,
            n_words,
            out=np.zeros(n, np.float64),
            where=n_words > 0,
        ),
        6,
    )
    return pa.table(
        {
            "doc_id": batch[id_col].cast(pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_pieces": pa.array(n_pieces, pa.int64()),
            "ratio": pa.array(ratio, pa.float64()),
        }
    )
