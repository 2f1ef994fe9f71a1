"""Mergeable-sketch operators: HyperLogLog approximate distinct count.

The 100-TB shape for COUNT(DISTINCT key) GROUP BY g when the key cardinality
is too large to shuffle: each batch folds its keys into a fixed-size HLL
register table (a PARTIAL — associative, commutative, idempotent max), the
exchange moves at most |groups| · m register rows per batch regardless of
input size, and the merged registers yield the estimate driver-side.

The exact twin (``distinct_count_exact``) uses the per-batch (group, key)
dedup combiner + one groupby — the oracle-checkable path; HLL is the sketch
path whose accuracy is pinned by pytest against the exact twin (~1.04/√m
relative error).  No reference counterpart (engine extension; the reference
has no aggregate sketches — SURVEY.md §2.10 scalars only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

#: 2^P registers per group; m=4096 → ~1.6 % typical error
HLL_P = 12
HLL_M = 1 << HLL_P


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants) — stable
    across runs/processes, unlike Python's salted hash()."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def hll_partial_batch(
    batch: pa.Table, key_col: str, group_col: str
) -> pa.Table:
    """Per-batch HLL combiner: (group, register, rho) rows with the batch's
    max rho per (group, register).

    Fully vectorized: one splitmix64 over the key column, register = top P
    bits, rho = 1 + leading-zero count of the remaining 64-P bits, then a
    lexsort + run-boundary max.  Output is ≤ |groups in batch| · 2^P rows —
    a bounded partial no matter the batch's row count."""
    keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    h = _splitmix64(keys.view(np.uint64))
    reg = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rho = clz(rest) + 1; rest is never 0 (low P bits are OR-set, capping
    # rho at 64-P+1).  Exact vectorized bit length via 6-step binary search
    # (float64 exponents misround above 2^53).
    x = rest.copy()
    bl = np.zeros(len(x), np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        bl[big] += np.uint64(s)
        x[big] >>= np.uint64(s)
    bl += x  # x ∈ {0,1} after the search; rest≠0 ⇒ x=1
    rho = (64 - bl.astype(np.int64)) + 1

    groups = batch[group_col]
    uniq, inv = np.unique(
        np.asarray(groups.to_pylist(), dtype=object), return_inverse=True
    )
    combo = inv.astype(np.int64) * HLL_M + reg
    order = np.argsort(combo, kind="stable")
    cs, rs = combo[order], rho[order]
    starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
    max_rho = np.maximum.reduceat(rs, starts)
    out_combo = cs[starts]
    return pa.table(
        {
            group_col: pa.array(uniq[out_combo // HLL_M], pa.string()),
            "register": pa.array(out_combo % HLL_M, pa.int64()),
            "rho": pa.array(max_rho, pa.int64()),
        }
    )


def hll_estimate(registers: np.ndarray) -> float:
    """Standard HLL estimate (Flajolet et al. 2007) with the small-range
    linear-counting correction; registers is the dense m-vector of max rho
    (0 = empty register)."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -registers.astype(np.float64)))
    zeros = int(np.sum(registers == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(
    ds: rd.Dataset, key_col: str, group_col: str
) -> pa.Table:
    """Approximate COUNT(DISTINCT key) GROUP BY group via distributed HLL:
    per-batch register partials → groupby(group, register).max (the only
    exchange, bounded by |groups| · 2^P rows) → driver-side estimate over
    the tiny merged register table."""
    from ray.data.aggregate import Max

    merged = (
        ds.map_batches(
            lambda b: hll_partial_batch(b, key_col, group_col),
            batch_format="pyarrow",
        )
        .groupby([group_col, "register"])
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
    )
    from anansi_ray.arrowds import stable_frame

    merged = stable_frame(
        merged, {group_col: "object", "register": "int64", "rho": "int64"}
    )
    out_groups, out_est = [], []
    for g, sub in merged.groupby(group_col, sort=True):
        dense = np.zeros(HLL_M, np.int64)
        dense[sub["register"].to_numpy()] = sub["rho"].to_numpy()
        out_groups.append(g)
        out_est.append(int(round(hll_estimate(dense))))
    return pa.table(
        {
            group_col: pa.array(out_groups, pa.string()),
            "approx_distinct": pa.array(out_est, pa.int64()),
        }
    )


def distinct_count_exact(
    ds: rd.Dataset, key_col: str, group_col: str
) -> pa.Table:
    """Exact twin: per-batch (group, key) dedup combiner BEFORE the
    exchange, then one groupby counts distinct keys per group.  The shuffle
    moves at most the batch's distinct pairs — correct at any scale, but
    the moved volume grows with true cardinality (that's what the HLL path
    caps)."""
    from ray.data.aggregate import Count

    def pair_partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = np.asarray(b[group_col].to_pylist(), dtype=object)
        uniq_g, inv = np.unique(grp, return_inverse=True)
        combo = np.unique(inv.astype(np.int64) << np.int64(44) | (keys & ((1 << 44) - 1)))
        # 44-bit key space is enough for the synthetic ids; at real scale the
        # pair would stay (group, key) two-column
        return pa.table(
            {
                group_col: pa.array(uniq_g[combo >> np.int64(44)], pa.string()),
                key_col: pa.array(combo & ((1 << 44) - 1), pa.int64()),
            }
        )

    from anansi_ray.arrowds import stable_frame

    pairs = ds.map_batches(pair_partial, batch_format="pyarrow")
    # second dedup across batches, then count per group
    return (
        stable_frame(
            pairs.groupby([group_col, key_col])
            .aggregate(Count(alias_name="n"))
            .groupby(group_col)
            .aggregate(Count(alias_name="n_distinct"))
            .to_pandas(),
            {group_col: "object", "n_distinct": "int64"},
        )
        .sort_values(group_col)
        .pipe(pa.Table.from_pandas, preserve_index=False)
        .select([group_col, "n_distinct"])
    )


# ---------------------------------------------------------------------------
# Mergeable deterministic quantile summary (MRL-style equal-weight spacing)
# ---------------------------------------------------------------------------

Q_SUMMARY_M = 512


def quantile_summary_partial(
    batch: pa.Table, value_col: str, m: int = Q_SUMMARY_M
) -> pa.Table:
    """Per-batch mergeable quantile summary: from the SORTED batch take
    ``min(m, n)`` evenly spaced order statistics, each carrying weight
    ``n / taken`` — a simplified Manku–Rajagopalan–Lindsay summary.  The
    per-batch rank error is ≤ n/(2m); summaries are merged by simple
    concatenation, so the total error over B batches is bounded by
    Σ n_b/(2m) = N/(2m) — deterministic, no randomness, and the state
    that leaves any batch is ≤ m rows regardless of batch size.

    Unlike the exact histogram path (events_quantiles), the summary never
    assumes a bounded value DOMAIN: it works for continuous values whose
    distinct count approaches the row count — the 100-TB fallback when a
    (group, grid-value) histogram would be as big as the data."""
    v = np.sort(batch[value_col].to_numpy(zero_copy_only=False))
    n = len(v)
    if n == 0:
        return pa.table(
            {"value": pa.array([], pa.float64()), "weight": pa.array([], pa.float64())}
        )
    take = min(m, n)
    # midpoints of `take` equal-count strata: index (i + 0.5) * n/take
    idx = ((np.arange(take) + 0.5) * n / take).astype(np.int64)
    return pa.table(
        {
            "value": pa.array(v[idx].astype(np.float64), pa.float64()),
            "weight": pa.array(np.full(take, n / take), pa.float64()),
        }
    )


def quantile_summary_estimate(
    summary: "pd.DataFrame", qs: list[float]
) -> list[float]:
    """Weighted lower inverse CDF over the concatenated summaries (the
    same ``cum >= q * tot`` convention as the exact path)."""
    if len(summary) == 0:
        # no data at all: every quantile of the empty distribution is NaN
        return [float("nan")] * len(qs)
    s = summary.sort_values("value")
    v = s["value"].to_numpy()
    w = s["weight"].to_numpy()
    cum = w.cumsum()
    tot = cum[-1]
    out = []
    for q in qs:
        out.append(float(v[np.searchsorted(cum, q * tot, side="left")]))
    return out


# ---------------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan 2005) over the corpus token
# stream.  Plain (non-conservative) CMS is LINEAR — cells are integer sums
# — so per-batch partial sketches merge EXACTLY whatever the block layout,
# which is what makes a full value oracle possible: DuckDB recomputes the
# same D×W table from scratch (same md5 bucket contract as dsir.py) and
# must land on identical estimates.  Estimates are reported for a fixed
# probe-token list next to their exact counts; CMS guarantees est ≥ exact.
#
# Shape at 100 TB: each batch reduces its token stream to one D×W integer
# matrix (a few KB) + a probe-count vector; the driver sums O(blocks)
# partials.  Nothing shuffles.

CMS_D = 4
CMS_W = 64
CMS_PROBES = (
    "a", "batch", "data", "hash", "join", "merge",
    "order", "sort", "stream", "the", "window", "zzz_absent",
)


def _cms_bucket(d: int, token: str) -> int:
    import hashlib

    return int(hashlib.md5(f"{d}:{token}".encode()).hexdigest()[:8], 16) % CMS_W


def cms_partial_batch(batch: "pa.Table", text_col: str = "text") -> "pa.Table":
    """Per-batch combiner: one flattened D×W cell vector + probe-token
    exact-count vector.  One md5 per DISTINCT token per batch."""
    import pyarrow.compute as pc

    toks = pc.split_pattern_regex(
        pc.utf8_lower(
            pc.fill_null(batch[text_col].combine_chunks().cast(pa.string()), "")
        ),
        "[^a-z0-9]+",
    )
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(str)
    flat = flat[flat != ""]
    uniq, counts = np.unique(flat, return_counts=True)
    M = np.zeros((CMS_D, CMS_W), np.int64)
    for u, c in zip(uniq, counts):
        for d in range(CMS_D):
            M[d, _cms_bucket(d, u)] += c
    probe = np.zeros(len(CMS_PROBES), np.int64)
    for i, p in enumerate(CMS_PROBES):
        hit = np.flatnonzero(uniq == p)
        if len(hit):
            probe[i] = counts[hit[0]]
    return pa.table(
        {
            "cells": pa.array([list(M.ravel())], pa.list_(pa.int64())),
            "probe": pa.array([list(probe)], pa.list_(pa.int64())),
        }
    )


def cms_counts(ds: "rd.Dataset") -> "pa.Table":
    """Distributed CMS build + probe estimates: (token, exact_cnt,
    cms_est) per probe token, ordered by token."""
    parts = ds.map_batches(cms_partial_batch, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        M = np.zeros((CMS_D, CMS_W), np.int64)
        probe = np.zeros(len(CMS_PROBES), np.int64)
    else:
        M = np.sum(
            np.stack([np.asarray(x, np.int64) for x in parts["cells"]]), axis=0
        ).reshape(CMS_D, CMS_W)
        probe = np.sum(
            np.stack([np.asarray(x, np.int64) for x in parts["probe"]]), axis=0
        )
    est = np.array(
        [
            min(M[d, _cms_bucket(d, p)] for d in range(CMS_D))
            for p in CMS_PROBES
        ],
        np.int64,
    )
    order = np.argsort(np.array(CMS_PROBES))
    return pa.table(
        {
            "token": pa.array(np.array(CMS_PROBES)[order], pa.string()),
            "exact_cnt": pa.array(probe[order], pa.int64()),
            "cms_est": pa.array(est[order], pa.int64()),
        }
    )
