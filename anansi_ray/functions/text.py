"""Text-analysis operators for large-scale training-data pipelines.

Engine extensions beyond the reference's operator set (SURVEY.md notes the
reference has none of these): language-ID, quality scoring, token counting,
document fingerprinting.  All are vectorized ``map_batches`` kernels over
Arrow batches; each has a ``queries()`` entry in ``__ray_entry__`` and — when
SQL-expressible — a DuckDB oracle that computes the identical definition.

Scale notes: every op here is embarrassingly parallel per batch (no shuffle);
at 100 TB they run as a single streaming pass with column pruning at the
read (only ``doc_id`` + ``text`` leave storage).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\s+")

#: tiny per-language stopword tables for the n-gram/stopword language-ID
#: heuristic (deterministic, dependency-free).
LANG_STOPWORDS: dict[str, frozenset] = {
    "en": frozenset("the a and of to in is for on with that it as at by".split()),
    "de": frozenset("der die das und ist nicht ein eine zu mit von auf für".split()),
    "es": frozenset("el la los las y es un una de en que por con para".split()),
    "fr": frozenset("le la les et est un une de en que pour avec dans".split()),
    "zh": frozenset("的 是 不 了 在 人 有 我 他 这 中 大 来 上".split()),
}
#: deterministic tie-break order
LANG_ORDER = tuple(sorted(LANG_STOPWORDS))

STOPWORDS = ("the", "a", "and", "of", "to", "in")


def _ws_tokens(batch_col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, list]:
    """Whitespace tokenization of a string column → (lengths, token lists)."""
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(batch_col), r"\s+")
    lens = pc.fill_null(pc.list_value_length(toks), 0)  # null text → 0 tokens
    return lens.cast(pa.int64()).to_numpy(zero_copy_only=False), toks


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (alnum runs and single non-space punct each count as one token)."""
    col = batch[text_col]
    n_ws, _ = _ws_tokens(col)
    # RE2 count of non-overlapping matches ≡ ``len(re.findall(...))`` —
    # whole-column vectorized (the per-row findall loop was the last Python
    # pass in this kernel)
    n_bpe = pc.fill_null(
        pc.count_substring_regex(col, r"[A-Za-z0-9]+|[^\sA-Za-z0-9]"), 0
    ).cast(pa.int64()).to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens_ws": pa.array(n_ws, pa.int64()),
            "n_tokens": pa.array(n_bpe, pa.int64()),
        }
    )


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality scoring: length, punctuation ratio, stopword ratio, mean word
    length — the standard cheap pretraining-corpus quality heuristics.
    Ratios rounded to 6 decimals (stable cross-engine comparison)."""
    col = batch[text_col]
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.float64)
    stripped = pc.replace_substring_regex(col, r"[A-Za-z0-9\s]", "")
    n_punct = pc.utf8_length(stripped).to_numpy(zero_copy_only=False).astype(np.float64)
    n_ws, toks = _ws_tokens(col)
    flat = pc.list_flatten(toks)
    is_stop = pc.is_in(flat, value_set=pa.array(list(STOPWORDS))).to_numpy(
        zero_copy_only=False
    )
    offsets = np.concatenate([[0], np.cumsum(n_ws)]).astype(np.int64)
    stop_counts = np.add.reduceat(
        np.concatenate([is_stop.astype(np.int64), [0]]), offsets[:-1]
    )
    stop_counts[n_ws == 0] = 0
    word_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    sum_wl = np.add.reduceat(np.concatenate([word_lens, [0]]), offsets[:-1]).astype(
        np.float64
    )
    sum_wl[n_ws == 0] = 0.0
    denom_tok = np.maximum(n_ws, 1).astype(np.float64)
    denom_chr = np.maximum(n_chars, 1.0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars.astype(np.int64), pa.int64()),
            "punct_ratio": pa.array(np.round(n_punct / denom_chr, 6), pa.float64()),
            "stopword_ratio": pa.array(np.round(stop_counts / denom_tok, 6), pa.float64()),
            "mean_word_len": pa.array(np.round(sum_wl / denom_tok, 6), pa.float64()),
        }
    )


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Language-ID heuristic: argmax of per-language stopword hit counts
    over whitespace tokens; deterministic alphabetical tie-break (argmax
    returns the FIRST language at the max over LANG_ORDER); 'und' when no
    list scores a hit.  Fully vectorized: one tokenization, one
    ``pc.is_in`` + ``reduceat`` per language."""
    col = pc.fill_null(batch[text_col], "")
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.utf8_trim_whitespace(col)), r"\s+"
    )
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    n = batch.num_rows
    scores = np.zeros((len(LANG_ORDER), n), dtype=np.int64)
    for li, lang in enumerate(LANG_ORDER):
        hit = pc.is_in(
            flat, value_set=pa.array(sorted(LANG_STOPWORDS[lang]))
        ).to_numpy(zero_copy_only=False)
        s = np.add.reduceat(np.concatenate([hit.astype(np.int64), [0]]), offsets[:-1])
        s[lens == 0] = 0
        scores[li] = s
    mx = scores.max(axis=0)
    win = scores.argmax(axis=0)  # first index at max ⇒ alphabetical winner
    langs = np.array(LANG_ORDER, dtype=object)
    out = np.where(mx > 0, langs[win], "und")
    return pa.table(
        {"doc_id": batch["doc_id"], "lang_pred": pa.array(list(out), pa.string())}
    )


#: FNV-1a prime, the k-gram polynomial multiplier; grams are finalized with
#: the splitmix64 avalanche so the per-window minimum is uniform.
_FNV = np.uint64(1099511628211)
_U64 = (1 << 64) - 1


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 avalanche (twin of
    functions/dedup._mix64, kept local so text ops stay dependency-free)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _fold_bytes(bs: bytes) -> int:
    """Scalar twin of the vectorized gram hash: FNV-prime polynomial fold
    of a byte string, splitmix64-finalized (used for sub-``k`` documents
    and as the loop reference in tests)."""
    g = 0
    for c in bs:
        g = (g * 1099511628211 + c) & _U64
    return int(_mix64(np.array([g], dtype=np.uint64))[0])


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprinting:

    * ``fp_md5``  — md5 of the whitespace-normalized lowercased text
      (exact-dup fingerprint; SQL-oracle-checkable),
    * ``fp_winnow`` — winnowing-style rolling-hash fingerprint: minimum
      64-bit k-gram (UTF-8 byte-gram) hash per window, hex-joined (robust
      near-dup sketch).

    The gram hashes for the WHOLE batch are computed in one vectorized pass
    over the concatenated normalized byte buffer (k shifted slices × FNV
    powers + splitmix64) — positions that straddle a document boundary are
    simply never read, because document d's valid gram starts are
    ``offset[d] .. offset[d] + len[d] - k``.  Per doc only the window-min /
    unique / top-16 selection runs (O(len) numpy views).
    """
    texts = batch[text_col].to_pylist()
    k, w = 5, 8
    md5s, winnows = [], []
    enc: list[bytes] = []
    for t in texts:
        b = _WS.sub(" ", (t or "").strip()).lower().encode("utf-8")
        enc.append(b)
        md5s.append(hashlib.md5(b).hexdigest())

    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
    offs = np.concatenate([[0], np.cumsum(lens)])
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
    if len(buf) >= k:
        g = np.zeros(len(buf) - k + 1, dtype=np.uint64)
        for j in range(k):
            g = g * _FNV + buf[j : len(buf) - k + 1 + j]
        H = _mix64(g)
    else:
        H = np.empty(0, dtype=np.uint64)
    # global sliding-window min — windows that straddle a document boundary
    # are computed but never selected (each doc reads only its valid range)
    M = (
        np.lib.stride_tricks.sliding_window_view(H, w).min(axis=1)
        if len(H) >= w
        else np.empty(0, dtype=np.uint64)
    )

    for d in range(len(enc)):
        L = int(lens[d])
        o = int(offs[d])
        n_grams = L - k + 1
        if n_grams >= w:
            sel = np.unique(M[o : o + n_grams - w + 1])
        elif L >= k:
            sel = np.array([H[o : o + n_grams].min()], dtype=np.uint64)
        else:
            # sub-k document: fold the whole (possibly empty) byte string
            sel = np.array([_fold_bytes(enc[d])], dtype=np.uint64)
        winnows.append("".join(f"{v:016x}" for v in sel[:16]))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fp_md5": pa.array(md5s, pa.string()),
            "fp_winnow": pa.array(winnows, pa.string()),
        }
    )


def token_df_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial document-frequency combiner.

    Tokenizes with the same ``\\w+`` word model the SimHash oracle uses
    (split on ``\\W+``, drop empties — identical token SET to a ``\\w+``
    findall), dedupes (doc, token) pairs, and emits one ``(token, df)``
    row per distinct token in the batch.  Feeding these partials into
    ``groupby("token").sum`` gives corpus DF with the combiner BEFORE the
    exchange: the shuffle moves at most |batch vocabulary| rows per batch,
    never the corpus's token stream."""
    import pandas as pd

    col = pc.fill_null(batch[text_col], "")
    toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\W+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    s = flat.to_pandas()
    mask = s.str.len() > 0
    df = (
        pd.DataFrame({"d": doc_idx[mask.to_numpy()], "t": s[mask]})
        .drop_duplicates()
        .groupby("t", sort=False)
        .size()
    )
    return pa.table(
        {
            "token": pa.array(df.index.to_numpy(dtype=object), pa.string()),
            "df": pa.array(df.to_numpy(dtype=np.int64), pa.int64()),
        }
    )


def tfidf_score_batch(
    batch: pa.Table,
    vocab_df: dict[str, int],
    n_docs: int,
    top_k: int = 3,
    text_col: str = "text",
) -> pa.Table:
    """Per-batch TF-IDF scoring against a BROADCAST bounded vocabulary.

    Each doc's term frequencies are counted over vocab tokens only (the
    vocabulary is the corpus's top-|V| tokens by document frequency —
    computed by the same token_df pipeline and shipped once via
    ``ray.put``, so no token-level shuffle ever happens); score =
    tf · ln(N/df) rounded to 6 dp, and only each doc's ``top_k`` terms by
    (score desc, token asc) leave the batch.  Batch-local: a doc is one
    row, so its top-k never crosses a block boundary."""
    import pandas as pd

    col = pc.fill_null(batch[text_col], "")
    toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\W+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    in_vocab = pc.is_in(
        flat, value_set=pa.array(sorted(vocab_df), pa.string())
    ).to_numpy(zero_copy_only=False)
    s = flat.to_pandas()
    keep = in_vocab & (s.str.len() > 0).to_numpy()
    tf = (
        pd.DataFrame({"d": doc_idx[keep], "t": s[keep]})
        .groupby(["d", "t"], sort=False)
        .size()
        .reset_index(name="tf")
    )
    if len(tf) == 0:
        return pa.table(
            {
                "doc_id": batch["doc_id"].slice(0, 0),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    tf["df"] = tf["t"].map(vocab_df).astype(np.int64)
    tf["score"] = np.round(
        tf["tf"].to_numpy(np.float64)
        * np.log(float(n_docs) / tf["df"].to_numpy(np.float64)),
        6,
    )
    top = (
        tf.sort_values(["d", "score", "t"], ascending=[True, False, True])
        .groupby("d", sort=False)
        .head(top_k)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"].take(pa.array(top["d"].to_numpy(), pa.int64())),
            "token": pa.array(top["t"].to_numpy(dtype=object), pa.string()),
            "tf": pa.array(top["tf"].to_numpy(np.int64), pa.int64()),
            "df": pa.array(top["df"].to_numpy(np.int64), pa.int64()),
            "score": pa.array(top["score"].to_numpy(np.float64), pa.float64()),
        }
    )


def shingles_for_batch(
    batch: pa.Table, k: int = 8, text_col: str = "text"
) -> tuple[np.ndarray, list[str]]:
    """(doc row-index, k-token shingle string) pairs for a batch: the
    ``\\w+`` token model, shingle = k consecutive tokens space-joined
    (byte-identical to DuckDB's ``array_to_string(toks[i:i+k-1], ' ')``).
    Tokenization/flattening is Arrow-vectorized; only the final join runs
    as one Python comprehension over the shingle windows (a rolling-hash
    variant would avoid even that at the cost of an oracle that can't
    recompute it — the string form keeps the twin exact)."""
    if text_col not in batch.column_names:
        # a schema-less empty table (Ray never runs UDFs on empty blocks,
        # so driver-side callers can hold a 0-column batch)
        return np.array([], dtype=np.int64), []
    col = pc.fill_null(batch[text_col], "")
    toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\W+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    nonempty = np.array([len(t) > 0 for t in flat], dtype=bool)
    flat, doc_idx = flat[nonempty], doc_idx[nonempty]
    counts = np.bincount(doc_idx, minlength=batch.num_rows)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    n_sh = np.maximum(counts - k + 1, 0)
    out_doc = np.repeat(np.arange(batch.num_rows, dtype=np.int64), n_sh)
    shingles = [
        " ".join(flat[offsets[d] + i : offsets[d] + i + k])
        for d in range(batch.num_rows)
        for i in range(n_sh[d])
    ]
    return out_doc, shingles


# ---------------------------------------------------------------------------
# PII redaction + repetition-ratio quality signal
# ---------------------------------------------------------------------------

#: RE2-compatible PII patterns (identical syntax/semantics in Arrow's
#: ``replace_substring_regex`` and DuckDB's ``regexp_replace(..., 'g')`` —
#: both engines are RE2).  Order matters: emails are redacted BEFORE IPv4 so
#: an address inside a hostname can't be double-hit.
PII_EMAIL_RE = r"[\w.+-]+@[\w-]+(\.[\w-]+)+"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """PII scrub: replace emails → ``<EMAIL>`` and IPv4 literals → ``<IP>``
    in one vectorized RE2 pass per pattern, with per-doc match counts.

    Batch-local, zero shuffle at any corpus size; the whole kernel is two
    ``count_substring_regex`` + two ``replace_substring_regex`` column
    scans (no per-row Python)."""
    col = pc.fill_null(batch[text_col], "")
    n_email = pc.count_substring_regex(col, PII_EMAIL_RE).cast(pa.int64())
    step1 = pc.replace_substring_regex(col, PII_EMAIL_RE, "<EMAIL>")
    n_ip = pc.count_substring_regex(step1, PII_IPV4_RE).cast(pa.int64())
    clean = pc.replace_substring_regex(step1, PII_IPV4_RE, "<IP>")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "clean_text": clean,
            "n_emails": n_email,
            "n_ips": n_ip,
        }
    )


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Repetition-ratio quality signal: 1 − (distinct tokens / tokens) per
    doc, with the same ``\\w+`` word model as token_df (split on ``\\W+``,
    drop empties).

    Vectorized: tokens are factorized ONCE per batch (np.unique with
    return_inverse), then per-doc distinct counts come from one np.unique
    over the combined (doc_idx, token_code) int64 key — no Python loop over
    rows or tokens.  Batch-local, zero shuffle."""
    col = pc.fill_null(batch[text_col], "")
    toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\W+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    doc_idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    doc_idx = doc_idx[nonempty]
    toks_np = np.asarray(flat.to_pylist(), dtype=object)[nonempty]
    n_tokens = np.bincount(doc_idx, minlength=batch.num_rows).astype(np.int64)
    if len(toks_np):
        _, codes = np.unique(toks_np, return_inverse=True)
        pair = doc_idx * (codes.max() + 1) + codes
        uniq_pairs = np.unique(pair)
        n_unique = np.bincount(
            uniq_pairs // (codes.max() + 1), minlength=batch.num_rows
        ).astype(np.int64)
    else:
        n_unique = np.zeros(batch.num_rows, np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        rep = np.where(
            n_tokens > 0, 1.0 - n_unique / np.maximum(n_tokens, 1), 0.0
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_unique": pa.array(n_unique, pa.int64()),
            "repetition": pa.array(np.round(rep, 6), pa.float64()),
        }
    )


def nfc_normalize_array(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """NFC-normalize a string column with a vectorized ASCII fast path.

    pyarrow's ``utf8_normalize`` does not COMPOSE (e + U+0301 stays two
    codepoints in 16.x), so true NFC needs ``unicodedata``.  Rows where
    byte length == codepoint length are pure ASCII — already NFC — and
    skip Python entirely; only the (typically rare) non-ASCII rows pay the
    per-row normalize.  On an ASCII-dominant corpus this is one compare
    mask + a short list comprehension."""
    import unicodedata

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ascii_mask = pc.equal(
        pc.binary_length(col), pc.utf8_length(col)
    ).to_numpy(zero_copy_only=False)
    if ascii_mask.all():
        return col
    vals = col.to_pylist()
    out = [
        v if (a or v is None) else unicodedata.normalize("NFC", v)
        for v, a in zip(vals, ascii_mask)
    ]
    return pa.array(out, pa.string())


def bigram_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch bigram-count combiner: one row per DISTINCT adjacent word
    pair seen in the batch, pre-summed, so the downstream
    ``groupby(bigram).sum(n)`` exchange carries batch-vocabulary-sized
    partials instead of one row per token position.

    Vectorized: split → ``list_flatten``; adjacent pairs are
    ``words[:-1] + ' ' + words[1:]`` masked to stay within a document
    (no cross-doc pairs); counting is one pandas ``value_counts`` pass."""
    import pandas as pd

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.split_pattern(pc.cast(col, pa.string()), " ")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    counts = pc.fill_null(pc.list_value_length(parts), 0).cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    words = pc.list_flatten(parts).to_pandas().to_numpy()
    if len(words) < 2:
        return pa.table({"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    same_doc = doc_idx[1:] == doc_idx[:-1]
    left = pd.Series(words[:-1][same_doc], dtype=object)
    right = pd.Series(words[1:][same_doc], dtype=object)
    vc = (left + " " + right).value_counts()
    return pa.table(
        {
            "bigram": pa.array(vc.index.to_numpy(), pa.string()),
            "n": pa.array(vc.to_numpy().astype(np.int64), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# RAG document chunking
# ---------------------------------------------------------------------------

#: fixed-window chunking parameters (chars): window / stride (overlap = W - S)
CHUNK_W = 200
CHUNK_S = 150


def chunk_documents_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Fixed-window overlapping chunker (the RAG / context-window splitter):
    window ``CHUNK_W`` chars, stride ``CHUNK_S`` (50-char overlap), last
    chunk truncated at the document end.  Emits one row per chunk with a
    content checksum (sum of Unicode code points) instead of the chunk text
    itself, so the operator's output is hash-comparable without moving the
    corpus.

    Fully vectorized and block-local (zero shuffle): the batch's text is
    decoded ONCE to a UTF-32 code-point array; per-chunk checksums are a
    cumsum difference at the chunk boundaries; chunk fan-out is np.repeat
    arithmetic.  No per-row or per-chunk Python.

    At 100 TB this is one streaming pass; emitting (offsets, checksums)
    rather than chunk text keeps the output ~100x smaller than the input —
    a downstream embedder re-slices the text locally from (doc_id,
    start_pos, chunk_len).
    """
    texts = pc.fill_null(batch[text_col], "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    joined = "".join(texts.to_pylist())
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = pc.utf8_length(texts).cast(pa.int64()).to_numpy(zero_copy_only=False)

    n_chunks = np.where(lens <= CHUNK_W, 1, 1 + (lens - CHUNK_W + CHUNK_S - 1) // CHUNK_S)
    doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), n_chunks)
    first = np.cumsum(n_chunks) - n_chunks
    chunk_idx = np.arange(doc_idx.size, dtype=np.int64) - first[doc_idx]

    doc_starts = np.cumsum(lens) - lens
    starts = doc_starts[doc_idx] + chunk_idx * CHUNK_S
    ends = np.minimum(starts + CHUNK_W, doc_starts[doc_idx] + lens[doc_idx])
    csum = np.concatenate([[0], np.cumsum(codes.astype(np.int64))])
    return pa.table(
        {
            "doc_id": pa.array(ids[doc_idx], pa.int64()),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "start_pos": pa.array(chunk_idx * CHUNK_S + 1, pa.int64()),
            "chunk_len": pa.array(ends - starts, pa.int64()),
            "code_sum": pa.array(csum[ends] - csum[starts], pa.int64()),
        }
    )


def token_doc_pairs(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Distinct (token, doc_id) pair emitter — the inverted-index combiner.

    Same ``\\w+`` token model as :func:`token_df_partial`.  Because every
    document lives in exactly one batch, per-batch dedup makes the pairs
    globally distinct: the downstream token exchange never sees a duplicate
    and needs no second dedup pass.  The shuffle carries one row per
    distinct (token, doc) — bounded by corpus vocabulary x df, never the
    token stream."""
    import pandas as pd

    col = pc.fill_null(batch[text_col], "")
    toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\W+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    doc_ids = np.repeat(ids, lens)
    s = flat.to_pandas()
    mask = (s.str.len() > 0).to_numpy()
    pairs = pd.DataFrame({"token": s[mask], "doc_id": doc_ids[mask]}).drop_duplicates()
    return pa.table(
        {
            "token": pa.array(pairs["token"].to_numpy(dtype=object), pa.string()),
            "doc_id": pa.array(pairs["doc_id"].to_numpy(dtype=np.int64), pa.int64()),
        }
    )


def bigram_doc_pairs(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-document bigram-multiplicity combiner: one row per (doc_id,
    distinct adjacent word pair) with its within-doc count ``m``.

    Same single-space word model as :func:`bigram_partial` (the corpus-
    count side of the bigram-LM join), so the two sides of the
    corpus-frequency join agree token-for-token.  Vectorized: split →
    flatten → same-doc mask → one pandas groupby over (doc, pair)."""
    import pandas as pd

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.split_pattern(pc.cast(col, pa.string()), " ")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    counts = pc.fill_null(pc.list_value_length(parts), 0).cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    words = pc.list_flatten(parts).to_pandas().to_numpy()
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "bigram": pa.array([], pa.string()),
            "m": pa.array([], pa.int64()),
        }
    )
    if len(words) < 2:
        return empty
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    same_doc = doc_idx[1:] == doc_idx[:-1]
    if not same_doc.any():
        return empty
    left = pd.Series(words[:-1][same_doc], dtype=object)
    right = pd.Series(words[1:][same_doc], dtype=object)
    df = pd.DataFrame(
        {
            "doc_id": ids[doc_idx[:-1][same_doc]],
            "bigram": (left + " " + right).to_numpy(dtype=object),
        }
    )
    g = df.groupby(["doc_id", "bigram"], sort=False).size().reset_index(name="m")
    return pa.table(
        {
            "doc_id": pa.array(g["doc_id"].to_numpy(dtype=np.int64), pa.int64()),
            "bigram": pa.array(g["bigram"].to_numpy(dtype=object), pa.string()),
            "m": pa.array(g["m"].to_numpy(dtype=np.int64), pa.int64()),
        }
    )


def word_hh_partial(batch: pa.Table, text_col: str = "text", phi_inv: int = 1000) -> pa.Table:
    """Heavy-hitter candidate combiner (pass 1 of exact two-pass heavy
    hitters): per batch, count words (single-space model, as
    :func:`bigram_partial`) and emit ONLY the words whose local share
    exceeds ``1/phi_inv``, plus one ``kind='t'`` row carrying the batch
    token total.

    Pigeonhole guarantee: a word with global frequency > N/phi_inv must
    exceed the threshold in at least one batch, so the union of per-batch
    candidates is a superset of the global heavy hitters — the exchange
    carries at most ``phi_inv`` rows per batch instead of the batch
    vocabulary."""
    import pandas as pd

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.split_pattern(pc.cast(col, pa.string()), " ")
    words = pc.list_flatten(parts).to_pandas().to_numpy()
    total = len(words)
    vc = pd.Series(words, dtype=object).value_counts()
    cand = vc[vc * phi_inv > total]
    return pa.table(
        {
            "kind": pa.array(["c"] * len(cand) + ["t"], pa.string()),
            "word": pa.array(
                list(cand.index.to_numpy(dtype=object)) + [""], pa.string()
            ),
            "n": pa.array(
                np.r_[cand.to_numpy().astype(np.int64), total], pa.int64()
            ),
        }
    )


def char_entropy_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document byte-level Shannon entropy (bits/byte) — the
    compression-style quality signal (low entropy ⇒ repetitive /
    boilerplate text; used by CCNet/Gopher-era filters alongside length
    and stopword ratios).

    Fully vectorized over the batch: the Arrow string column's raw data
    buffer is viewed as ONE uint8 array, per-byte document indices come
    from one ``np.repeat`` over the offsets, and all per-document byte
    histograms land in a single ``np.bincount`` over ``doc_idx*256 +
    byte`` — no per-row Python.  On the ASCII corpus byte entropy equals
    character entropy, which is what the DuckDB twin computes."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(pc.cast(col, pa.string()), "")
    ids = batch["doc_id"].combine_chunks().cast(pa.int64())
    n = len(col)
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bytes": pa.array([], pa.int64()),
                "entropy": pa.array([], pa.float64()),
            }
        )
    buf_off, buf_data = col.buffers()[1], col.buffers()[2]
    offsets = np.frombuffer(buf_off, dtype=np.int32, count=n + 1 + col.offset)[
        col.offset :
    ].astype(np.int64)
    data = np.frombuffer(buf_data, dtype=np.uint8)
    lengths = np.diff(offsets)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
    stream = data[offsets[0] : offsets[-1]]
    counts = np.bincount(doc_idx * 256 + stream, minlength=n * 256).reshape(
        n, 256
    )
    tot = lengths.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = counts / np.maximum(tot, 1.0)[:, None]
        terms = np.where(counts > 0, -p * np.log2(np.maximum(p, 1e-300)), 0.0)
    ent = np.round(terms.sum(axis=1), 6)
    ent[lengths == 0] = 0.0
    return pa.table(
        {
            "doc_id": ids,
            "n_bytes": pa.array(lengths, pa.int64()),
            "entropy": pa.array(ent, pa.float64()),
        }
    )
