"""Distributed logistic-regression training over the documents table —
the canonical "train a quality/domain classifier on corpus features"
step of an LLM data pipeline (e.g. the GPT-3/CCNet-style quality filter:
fit a classifier that separates a target domain, score every document).

Task: predict ``lang == 'en'`` from five cheap per-doc text statistics.
Full-batch gradient descent, fixed iteration count, no stochasticity.

Shape at 100 TB: each iteration is ONE streaming ``map_batches`` pass
reducing every batch to a (dim+1)-vector partial (feature-weighted
residual sums + count); the driver merges O(blocks) tiny partials,
updates the weight vector, and re-broadcasts it (``ray.put``).  The
corpus never shuffles and is materialized once; scoring is a final
streaming pass with the trained weights broadcast.

Determinism contract (the :func:`logreg_local` twin reproduces the
distributed output bit-for-bit — same playbook as ``clustering``):
features are per-row reductions (identical wherever the row lands);
the weight vector is ROUNDED to ``LR_ROUND`` decimals after every
update, absorbing the ~1e-13 drift between block-wise and sequential
gradient summation; probabilities are rounded to ``LR_ROUND`` before
output; predictions threshold at 0.5 on the ROUNDED probability.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

LR_ITERS = 10
LR_ETA = 0.5
LR_ROUND = 6
LR_DIM = 5  # bias + 4 text statistics

OUT_SPEC = {
    "doc_id": pa.int64(),
    "label": pa.int64(),
    "prob": pa.float64(),
    "pred": pa.int64(),
}

_STOPWORDS = ("the", "a")


def _empty_out() -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in OUT_SPEC.items()})


def _features(batch: pa.Table) -> np.ndarray:
    """Per-doc feature matrix — every column is a per-row reduction over
    that row's own tokens (same value whatever batch the row lands in):
    [bias, n_tokens/100, mean token length, stopword ratio,
    distinct-token ratio]."""
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
    ntok = np.bincount(parents, minlength=n).astype(np.float64)
    safe = np.maximum(ntok, 1.0)
    charlen = np.char.str_len(flat).astype(np.float64) if len(flat) else np.array([])
    sumlen = (
        np.bincount(parents, weights=charlen, minlength=n)
        if len(flat)
        else np.zeros(n)
    )
    stop = (
        np.bincount(
            parents[np.isin(flat, _STOPWORDS)], minlength=n
        ).astype(np.float64)
        if len(flat)
        else np.zeros(n)
    )
    # distinct tokens per doc: unique over integer (parent, token) pair
    # keys (numpy U-dtype silently drops NUL separators, so never
    # string-compose composite keys)
    if len(flat):
        ut, tinv = np.unique(flat, return_inverse=True)
        pair = parents.astype(np.int64) * len(ut) + tinv
        upair = np.unique(pair)
        distinct = np.bincount(
            (upair // len(ut)).astype(np.int64), minlength=n
        ).astype(np.float64)
    else:
        distinct = np.zeros(n)
    X = np.empty((n, LR_DIM), np.float64)
    X[:, 0] = 1.0
    X[:, 1] = ntok / 100.0
    X[:, 2] = sumlen / safe
    X[:, 3] = stop / safe
    X[:, 4] = distinct / safe
    return X


def _labels(batch: pa.Table) -> np.ndarray:
    return (
        pc.equal(batch["lang"].combine_chunks().cast(pa.string()), "en")
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-z))


def _grad_partial(X: np.ndarray, y: np.ndarray, w: np.ndarray):
    r = _sigmoid(X @ w) - y
    return X.T @ r, float(len(y))


def _score_rows(batch: pa.Table, w: np.ndarray, id_col: str) -> pa.Table:
    X = _features(batch)
    y = _labels(batch)
    p = np.round(_sigmoid(X @ w), LR_ROUND)
    return pa.table(
        {
            "doc_id": batch[id_col].cast(pa.int64()),
            "label": pa.array(y.astype(np.int64), pa.int64()),
            "prob": pa.array(p, pa.float64()),
            "pred": pa.array((p >= 0.5).astype(np.int64), pa.int64()),
        }
    )


def featurize(ds: rd.Dataset, id_col: str = "doc_id") -> rd.Dataset:
    """ONE tokenization pass → materialized narrow (id, X, y) Dataset
    (6 float64 + id per row).  GD iterations then stream ~56 B/row
    instead of re-tokenizing the corpus every pass — at 100 TB this is
    the difference between 10 text scans and 1.  Float64 storage
    round-trips exactly, so gradients computed from the stored features
    are bit-equal to recomputing them from text."""

    def feat(batch: pa.Table) -> pa.Table:
        X = _features(batch)
        y = _labels(batch)
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "X": pa.array(list(X), pa.list_(pa.float64())),
                "y": pa.array(y, pa.float64()),
            }
        )

    return ds.map_batches(feat, batch_format="pyarrow").materialize()


def _feat_mat(batch: pa.Table):
    """(X, y) back from a featurized batch — flatten/reshape, no Python
    per-row loop."""
    X = (
        batch["X"]
        .combine_chunks()
        .flatten()
        .to_numpy(zero_copy_only=False)
        .reshape(batch.num_rows, LR_DIM)
    )
    y = batch["y"].to_numpy(zero_copy_only=False)
    return X, y


def logreg_train(ds: rd.Dataset, featurized: bool = False):
    """The GD loop alone (shared by scoring and evaluation pipelines):
    returns the trained rounded weight vector, or ``None`` on an empty
    corpus.  ``ds`` must be materialized by the caller.  Pass
    ``featurized=True`` when ``ds`` already is a :func:`featurize`
    output (the CV path shares one featurization across folds)."""
    fds = ds if featurized else featurize(ds)
    w = np.zeros(LR_DIM)
    for _ in range(LR_ITERS):
        wref = ray.put(w)

        def partial(batch: pa.Table) -> pa.Table:
            w_ = ray.get(wref)
            X, y = _feat_mat(batch)
            g, n = _grad_partial(X, y, w_)
            return pa.table(
                {
                    "g": pa.array([list(g)], pa.list_(pa.float64())),
                    "n": pa.array([n], pa.float64()),
                }
            )

        parts = fds.map_batches(partial, batch_format="pyarrow").to_pandas()
        if len(parts) == 0 or parts["n"].sum() == 0:
            return None
        g = np.sum(np.stack([np.asarray(x, np.float64) for x in parts["g"]]), axis=0)
        w = np.round(w - LR_ETA * g / parts["n"].sum(), LR_ROUND)
    return w


def logreg_distributed(ds: rd.Dataset, id_col: str = "doc_id") -> pa.Table:
    """Fixed-iteration full-batch GD: per-batch gradient partials →
    driver merge → rounded weight update → re-broadcast; final scoring
    pass with the trained weights."""
    ds = ds.materialize()
    w = logreg_train(ds)
    if w is None:
        return _empty_out()
    wref = ray.put(w)
    out = ds.map_batches(
        lambda b: _score_rows(b, ray.get(wref), id_col), batch_format="pyarrow"
    ).to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


CV_FOLDS = 3

CV_SPEC = {
    "fold": pa.int64(),
    "n_train": pa.int64(),
    "n_test": pa.int64(),
    "accuracy": pa.float64(),
}


def _cv_empty() -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in CV_SPEC.items()})


def _fold_mask(batch: pa.Table, fold: int, id_col: str, train: bool):
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    m = (ids % CV_FOLDS) != fold if train else (ids % CV_FOLDS) == fold
    return batch.filter(pa.array(m))


def logreg_cv_distributed(ds: rd.Dataset, id_col: str = "doc_id") -> pa.Table:
    """Deterministic k-fold cross-validation (folds = doc_id % k),
    FOLD-FUSED: one streaming pass per GD iteration computes ALL K
    folds' gradient partials (each batch featurizes once and emits K
    masked (grad, n) pairs), so the loop costs ``LR_ITERS`` corpus
    passes instead of ``K·LR_ITERS``; one final fused pass scores every
    fold's held-out accuracy partials.  Bit-equal to per-fold training:
    a block's masked gradient is the SAME BLAS reduction the filtered
    block computed (per-row features are batch-independent), partials
    merge in the same block order, and blocks with no train rows
    contribute exact zeros.  Output: per-fold sizes + accuracy."""
    fds = featurize(ds.materialize(), id_col)
    W = np.zeros((CV_FOLDS, LR_DIM))
    n_train = np.zeros(CV_FOLDS, dtype=np.int64)
    active = np.ones(CV_FOLDS, dtype=bool)
    for _ in range(LR_ITERS):
        wref = ray.put(W.copy())

        def grad_partials(batch: pa.Table) -> pa.Table:
            W_ = ray.get(wref)
            X, y = _feat_mat(batch)
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            gs, ns = [], []
            for f in range(CV_FOLDS):
                m = (ids % CV_FOLDS) != f
                g, n = _grad_partial(X[m], y[m], W_[f])
                gs.append(list(g))
                ns.append(n)
            return pa.table(
                {
                    "fold": pa.array(range(CV_FOLDS), pa.int64()),
                    "g": pa.array(gs, pa.list_(pa.float64())),
                    "n": pa.array(ns, pa.float64()),
                }
            )

        parts = fds.map_batches(grad_partials, batch_format="pyarrow").to_pandas()
        if len(parts) == 0:
            active[:] = False
            break
        for f in range(CV_FOLDS):
            pf = parts[parts["fold"] == f]
            nsum = pf["n"].sum()
            if nsum == 0:
                active[f] = False
                continue
            g = np.sum(
                np.stack([np.asarray(x, np.float64) for x in pf["g"]]), axis=0
            )
            W[f] = np.round(W[f] - LR_ETA * g / nsum, LR_ROUND)
            n_train[f] = int(nsum)

    wref = ray.put(W.copy())

    def acc_partials(batch: pa.Table) -> pa.Table:
        W_ = ray.get(wref)
        X, y = _feat_mat(batch)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ns, oks = [], []
        for f in range(CV_FOLDS):
            m = (ids % CV_FOLDS) == f
            if not m.any():
                ns.append(0)
                oks.append(0)
                continue
            # same math as _score_rows: prob rounded BEFORE the 0.5
            # threshold, labels from the stored y
            p = np.round(_sigmoid(X[m] @ W_[f]), LR_ROUND)
            pred = (p >= 0.5).astype(np.int64)
            lab = y[m].astype(np.int64)
            ns.append(int(m.sum()))
            oks.append(int((lab == pred).sum()))
        return pa.table(
            {
                "fold": pa.array(range(CV_FOLDS), pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "ok": pa.array(oks, pa.int64()),
            }
        )

    acc = fds.map_batches(acc_partials, batch_format="pyarrow").to_pandas()
    rows = []
    for f in range(CV_FOLDS):
        if not active[f]:
            continue
        af = acc[acc["fold"] == f] if len(acc) else acc
        n_test = int(af["n"].sum()) if len(af) else 0
        if n_test == 0:
            continue
        rows.append(
            (
                f,
                int(n_train[f]),
                n_test,
                round(float(af["ok"].sum()) / n_test, 6),
            )
        )
    if not rows:
        return _cv_empty()
    return pa.table(
        {
            "fold": pa.array([r[0] for r in rows], pa.int64()),
            "n_train": pa.array([r[1] for r in rows], pa.int64()),
            "n_test": pa.array([r[2] for r in rows], pa.int64()),
            "accuracy": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def logreg_cv_local(tbl: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Sequential twin: same fold rule, same kernels, one slice."""
    if tbl.num_rows == 0:
        return _cv_empty()
    rows = []
    for fold in range(CV_FOLDS):
        train = _fold_mask(tbl, fold, id_col, True)
        test = _fold_mask(tbl, fold, id_col, False)
        if train.num_rows == 0 or test.num_rows == 0:
            continue
        X = _features(train)
        y = _labels(train)
        w = np.zeros(LR_DIM)
        for _ in range(LR_ITERS):
            g, n = _grad_partial(X, y, w)
            w = np.round(w - LR_ETA * g / n, LR_ROUND)
        scored = _score_rows(test, w, id_col)
        lab = scored["label"].to_numpy(zero_copy_only=False)
        pred = scored["pred"].to_numpy(zero_copy_only=False)
        rows.append(
            (
                fold,
                train.num_rows,
                test.num_rows,
                round(float((lab == pred).sum()) / test.num_rows, 6),
            )
        )
    if not rows:
        return _cv_empty()
    return pa.table(
        {
            "fold": pa.array([r[0] for r in rows], pa.int64()),
            "n_train": pa.array([r[1] for r in rows], pa.int64()),
            "n_test": pa.array([r[2] for r in rows], pa.int64()),
            "accuracy": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def logreg_local(tbl: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Single-threaded twin (the oracle side): same kernels, one
    gradient sweep per iteration."""
    if tbl.num_rows == 0:
        return _empty_out()
    X = _features(tbl)
    y = _labels(tbl)
    w = np.zeros(LR_DIM)
    for _ in range(LR_ITERS):
        g, n = _grad_partial(X, y, w)
        w = np.round(w - LR_ETA * g / n, LR_ROUND)
    out = _score_rows(tbl, w, id_col).to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)
