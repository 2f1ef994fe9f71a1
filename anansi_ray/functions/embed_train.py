"""PPMI-SVD word embeddings (Levy & Goldberg 2014, "Neural Word
Embedding as Implicit Matrix Factorization"): the count-based twin of
word2vec — build the positive-PMI co-occurrence matrix over a bounded
vocabulary and factor it with a truncated SVD; word vectors are
U_k·√Σ_k and similarity is their cosine.

Distribution story: the only corpus-scale work is the pair-count pass
(pipelines/queries._vocab_pair_counts — per-batch V×V bincount
partials, one bounded exchange); the PPMI build + SVD run on the tiny
V×V matrix wherever convenient.

Determinism + oracle surface: the PPMI matrix is ROUNDED to
``EMB_ROUND`` before the SVD, so both twins factor the identical
matrix; the REPORTED surface is cosine nearest neighbours, which are
invariant under the factorization's sign/rotation ambiguity (any
orthogonal transform of the embedding dims preserves inner products),
with ties broken (cosine desc, word asc) on the rounded cosine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EMB_DIMS = 8
EMB_TOPK = 3
EMB_NPROBE = 5  # probe words: the alphabetically-first NPROBE vocab words
EMB_ROUND = 6

OUT_SPEC = {
    "probe": pa.string(),
    "rank": pa.int64(),
    "neighbor": pa.string(),
    "cosine": pa.float64(),
}


def empty_out() -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in OUT_SPEC.items()})


def ppmi_matrix(
    ia: np.ndarray, ib: np.ndarray, n_ab: np.ndarray,
    df: np.ndarray, n_docs: int,
) -> np.ndarray:
    """Symmetric positive-PMI matrix over the vocab (diagonal 0),
    rounded — the shared input both twins hand to the SVD."""
    V = len(df)
    M = np.zeros((V, V))
    pmi = np.log(
        n_ab.astype(np.float64) * float(n_docs)
        / (df[ia].astype(np.float64) * df[ib])
    )
    pos = pmi > 0
    M[ia[pos], ib[pos]] = pmi[pos]
    M[ib[pos], ia[pos]] = pmi[pos]
    return np.round(M, EMB_ROUND)


def svd_neighbors(
    M: np.ndarray, vocab: np.ndarray,
    k_dims: int = EMB_DIMS, nprobe: int = EMB_NPROBE, topk: int = EMB_TOPK,
) -> pa.Table:
    """Truncated SVD → W = U_k √Σ_k → cosine top-k neighbours for the
    alphabetically-first ``nprobe`` vocab words."""
    V = M.shape[0]
    if V < 2:
        return empty_out()
    U, S, _ = np.linalg.svd(M)
    k = min(k_dims, V)
    W = U[:, :k] * np.sqrt(S[:k])[None, :]
    norms = np.linalg.norm(W, axis=1)
    ok = norms > 0
    Wn = np.zeros_like(W)
    Wn[ok] = W[ok] / norms[ok, None]
    out_p, out_r, out_n, out_c = [], [], [], []
    for qi in range(min(nprobe, V)):
        if not ok[qi]:
            continue
        cos = np.round(Wn @ Wn[qi], EMB_ROUND)
        cand = np.array([j for j in range(V) if j != qi and ok[j]], np.int64)
        if len(cand) == 0:
            continue
        order = cand[np.lexsort((vocab[cand], -cos[cand]))[:topk]]
        for r, j in enumerate(order, 1):
            out_p.append(vocab[qi])
            out_r.append(r)
            out_n.append(vocab[j])
            out_c.append(float(cos[j]))
    return pa.table(
        {
            "probe": pa.array(out_p, pa.string()),
            "rank": pa.array(out_r, pa.int64()),
            "neighbor": pa.array(out_n, pa.string()),
            "cosine": pa.array(out_c, pa.float64()),
        }
    )
