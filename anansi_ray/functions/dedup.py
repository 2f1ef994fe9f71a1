"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All expressed Ray-Data-first:

* exact      — hash inside ``map_batches`` (partial), then one
               ``groupby(text_hash)`` shuffle keeping min doc_id
* MinHash    — shingle→minhash signature per batch (vectorized numpy
               universal hashing), explode to (band_key, doc_id) rows,
               bucket → candidate pairs → verify by signature agreement
               (estimated Jaccard) → connected components
* SimHash    — 64-bit signature + pigeonhole piece-bucketing for
               hamming-distance candidates
* embedding  — brute-force blockwise cosine vs a broadcast normalized
               matrix (exact; the SQL-oracle-checkable path) — the IVF/LSH
               scale path lives in functions/similarity.py

Scale notes: every shuffle is on a uniformly-distributed hash key
(text_hash, band key, doc id, pair id).  Small-group stages (one LSH
bucket, one doc's signature, one pair) do NOT run as per-group Python:
rows carry an explicit ``part = mix64(key) % N_PARTS`` column, the
exchange is ``groupby(part)`` (N_PARTS coarse partitions instead of
millions of micro-groups) and each partition kernel sorts its table once
and walks group boundaries with numpy (``flatnonzero`` on key-change
masks + ``take``) — thousands of per-group UDF invocations collapse into
one vectorized pass per partition.  MinHash verification joins signatures
back through the distributed repartition join (:func:`attach_pair_values`)
and connected components run as iterated min-label propagation over the
edge-node set only (:func:`connected_components_distributed`), merging
singletons back in one final corpus-wide exchange; the driver-side
union-find remains only as the small-scale reference the equality tests
pin against.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from anansi_ray.arrowds import drop_empty_blocks as _drop_empty_blocks

_TOKEN = re.compile(r"\w+", re.UNICODE)

# MinHash parameters: 128 permutations = 32 bands × 4 rows
# (LSH threshold ≈ (1/32)^(1/4) ≈ 0.42 Jaccard)
N_PERM = 128
N_BANDS = 32
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1

#: cap on coarse exchange partitions for the vectorized repartition
#: kernels.  Scale knob: size so one partition (≈ rows / n_parts) fits a
#: worker heap; the kernels are O(n log n) per partition and independent
#: of the group count within it.
N_PARTS = 4096


def _auto_parts(n_rows: int) -> int:
    """Partition count from (materialized) input cardinality: ~250k rows
    per partition, floor 8 so small clusters still overlap, cap N_PARTS.
    Exchange fixed cost is per partition TASK, so a toy input must not pay
    a 10^9-row partition layout — and vice versa."""
    return int(max(8, min(N_PARTS, n_rows // 250_000 + 8)))

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 (numpy<2 has no bitwise_count)."""
    x = x - ((x >> np.uint64(1)) & _M1)
    x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
    x = (x + (x >> np.uint64(4))) & _M4
    return ((x * _H01) >> np.uint64(56)).astype(np.int64)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 avalanche."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _part_np(key: np.ndarray, n_parts: int = N_PARTS) -> pa.Array:
    """Uniform partition id from an int64/uint64 key array."""
    return pa.array(
        (_mix64(key.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int32),
        pa.int32(),
    )


def _np(col) -> np.ndarray:
    """Arrow (Chunked)Array → numpy, tolerating chunking."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def text_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content hash (truncated SHA-256, same shape as the crawl cache key —
    cache.c:103-129) appended per batch; the partial step of exact dedup."""
    hashes = [
        hashlib.sha256((t or "").encode("utf-8")).hexdigest()[:32]
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Exact dedup: hash-partition + per-group min id (D1 analogue).

    Returns one row per distinct text: (text_hash, doc_id=min id).

    Shape: a vectorized per-batch combiner (keep min id per hash inside each
    batch — numpy lexsort, no Python per group) shrinks the exchange to one
    row per (batch, distinct hash); the final reduce is a native
    ``groupby().min()`` aggregate, NOT ``map_groups`` — at corpus scale the
    latter would invoke a Python UDF once per distinct text (the micro-group
    anti-pattern this file's header warns against)."""

    def combine(b: pa.Table) -> pa.Table:
        t = text_hash_batch(b, text_col)
        ids = _np(t[id_col])
        if ids.dtype == object or ids.dtype.kind in "US":
            ids = ids.astype(object)
        hashes = _np(t["text_hash"]).astype(object)
        # lexsort: primary key hash, secondary id ⇒ first row of each hash
        # run is the per-batch min id for that hash
        order = np.lexsort((ids, hashes))
        h_sorted = hashes[order]
        first = np.ones(len(h_sorted), dtype=bool)
        first[1:] = h_sorted[1:] != h_sorted[:-1]
        keep = order[first]
        id_arr = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        return pa.table(
            {
                "text_hash": pa.array(hashes[keep], pa.string()),
                id_col: id_arr.take(pa.array(keep, pa.int64())),
            }
        )

    reduced = ds.map_batches(combine, batch_format="pyarrow").groupby("text_hash").min(id_col)
    return reduced.map_batches(
        lambda b: b.rename_columns(["text_hash", id_col]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _perm_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, N_PERM, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, N_PERM, dtype=np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()

# per-process token→hash memo: blake2b runs once per DISTINCT token seen by
# the worker, not once per shingle occurrence; bounded so a pathological
# vocabulary can't grow the worker heap
_TOK_CACHE: dict[str, int] = {}
_TOK_CACHE_MAX = 1_000_000


def _token_hashes(toks: list[str]) -> np.ndarray:
    cache = _TOK_CACHE
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            if len(cache) >= _TOK_CACHE_MAX:
                cache.clear()
            h = int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
            )
            cache[t] = h
        out[i] = h
    return out


def _shingle_hashes(text: str, w: int = 3) -> np.ndarray:
    """Token w-gram shingles → stable 61-bit hashes.

    Gram hash = order-sensitive splitmix64 fold of the w per-token blake2b
    hashes — one vectorized pass instead of one digest per gram (the
    round-2 hot loop)."""
    toks = _TOKEN.findall((text or "").lower())
    if len(toks) < w:
        gram = " ".join(toks) if toks else ""
        h = (
            int.from_bytes(hashlib.blake2b(gram.encode(), digest_size=8).digest(), "big")
            & _MERSENNE
        )
        return np.asarray([h], dtype=np.uint64)
    th = _token_hashes(toks)
    n = len(toks) - w + 1
    acc = _mix64(th[:n])
    for j in range(1, w):
        acc = _mix64(acc * _GOLDEN ^ th[j : j + n])
    return np.unique(acc & np.uint64(_MERSENNE))


def minhash_signature(text: str) -> np.ndarray:
    """128-perm MinHash signature via universal hashing (vectorized)."""
    sh = _shingle_hashes(text)
    # (n_perm, n_shingles) universal hash, min over shingles
    vals = (_PERM_A[:, None] * sh[None, :] + _PERM_B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_sig_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per batch: one MinHash signature row per doc."""
    ids = batch["doc_id"].to_pylist()
    sigs = [minhash_signature(t).astype(np.int64) for t in batch[text_col].to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "sig": pa.array(sigs, pa.list_(pa.int64())),
        }
    )


def minhash_signatures(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Materialized per-doc signature Dataset (doc_id, sig) — computed ONCE
    and shared by every downstream consumer (banding, verification, exact
    n-gram Jaccard) so no query recomputes the 128-perm pass.

    The signature pass runs at the input's (wide) parallelism for CPU
    overlap, then compacts to the exchange partition layout so downstream
    shuffles schedule O(parts) tasks instead of O(input blocks)."""
    sig = ds.map_batches(
        lambda b: minhash_sig_batch(b, text_col), batch_format="pyarrow"
    ).materialize()
    nb = _auto_parts(sig.count())
    if sig.num_blocks() > nb:
        sig = sig.repartition(nb).materialize()
    return sig


_EMPTY_BANDS = pa.table(
    {
        "part": pa.array([], pa.int32()),
        "bkey": pa.array([], pa.int64()),
        "doc_id": pa.array([], pa.int64()),
    }
)


def _sigs_to_bands(batch: pa.Table, n_parts: int = N_PARTS) -> pa.Table:
    """Explode signatures to (part, band_key, doc_id) rows — the pre-shuffle
    partial of the LSH bucketing.  Band key = 64-bit splitmix fold of the
    band's 4 minima + band-id salt (bucket membership is equality of the
    band VALUES; the key representation is free to be numeric, which keeps
    the shuffle narrow — no signature payload, no hex strings)."""
    n = batch.num_rows
    if n == 0:
        return _EMPTY_BANDS
    sig = np.asarray(_np(batch["sig"].combine_chunks().flatten()), dtype=np.uint64)
    bands = sig.reshape(n, N_BANDS, ROWS_PER_BAND)
    salt = (np.arange(N_BANDS, dtype=np.uint64) * _GOLDEN)[None, :]
    acc = _mix64(bands[:, :, 0] ^ salt)
    for r in range(1, ROWS_PER_BAND):
        acc = _mix64(acc * _GOLDEN ^ bands[:, :, r])
    bkey = acc.reshape(-1)
    ids = np.repeat(np.asarray(_np(batch["doc_id"]), dtype=np.int64), N_BANDS)
    return pa.table(
        {
            "part": _part_np(bkey, n_parts),
            "bkey": pa.array(bkey.view(np.int64), pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
        }
    )


_EMPTY_PAIRS = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})


def _band_pairs_part(group: pa.Table) -> pa.Table:
    """One coarse partition of band rows → candidate pairs (a < b) for every
    bucket inside it: sort once by (bkey, doc_id), enumerate pairs per
    key-run.  Replaces per-bucket ``map_groups`` micro-invocations."""
    if group.num_rows == 0:
        return _EMPTY_PAIRS
    t = group.take(
        pc.sort_indices(
            group, sort_keys=[("bkey", "ascending"), ("doc_id", "ascending")]
        )
    )
    bk = _np(t["bkey"])
    ids = _np(t["doc_id"])
    new = np.r_[True, bk[1:] != bk[:-1]]
    starts = np.flatnonzero(new)
    lens = np.diff(np.r_[starts, len(bk)])
    multi = lens >= 2
    if not multi.any():
        return _EMPTY_PAIRS
    a_out, b_out = [], []
    for s, l in zip(starts[multi], lens[multi]):
        run = ids[s : s + l]
        ai, bi = np.triu_indices(l, k=1)
        a_out.append(run[ai])
        b_out.append(run[bi])
    return pa.table(
        {
            "a": pa.array(np.concatenate(a_out), pa.int64()),
            "b": pa.array(np.concatenate(b_out), pa.int64()),
        }
    )


def attach_pair_values(
    pairs_ds: rd.Dataset,
    values_ds: rd.Dataset,
    key_col: str,
    val_col: str,
    val_type,
    n_parts: int = N_PARTS,
) -> rd.Dataset:
    """Repartition join of candidate pairs against a per-doc value table.

    ``pairs_ds`` rows are ``(a, b)``; ``values_ds`` rows are
    ``(key_col, val_col)``.  Returns ``(a, b, val_a, val_b)``.

    Distributed shape (the ~10^9-doc path — nothing touches the driver):

    1. explode each pair to two endpoint rows ``(k=a, slot=0)`` /
       ``(k=b, slot=1)`` carrying the pair identity,
    2. union with the value table tagged ``slot=-1``,
    3. exchange on ``part = mix64(k) % n_parts``; each partition kernel
       sorts by (k, slot) and stamps every endpoint row with its doc's
       value in one vectorized pass (value rows sort first per key-run),
    4. exchange on ``pp = mix64(pair) % n_parts``; each partition kernel
       sorts by (a, b, slot) and reunites the two stamped endpoints into
       one ``(a, b, val_a, val_b)`` row — duplicate pair rows (the same
       (a, b) surfacing from several LSH buckets) collapse here for free.

    Both exchange keys are uniform by construction.  Values of any Arrow
    type work (unlike Acero hash joins, which reject list-typed payloads).
    """

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        a = batch["a"].combine_chunks()
        b = batch["b"].combine_chunks()
        k = pa.concat_arrays([a, b])
        return pa.table(
            {
                "part": _part_np(k.to_numpy(zero_copy_only=False), n_parts),
                "k": k,
                "a": pa.concat_arrays([a, a]),
                "b": pa.concat_arrays([b, b]),
                "slot": pa.array([0] * n + [1] * n, pa.int8()),
                "val": pa.nulls(2 * n, val_type),
            }
        )

    def tag_values(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        k = batch[key_col].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "part": _part_np(k.to_numpy(zero_copy_only=False), n_parts),
                "k": k,
                "a": pa.nulls(n, pa.int64()),
                "b": pa.nulls(n, pa.int64()),
                "slot": pa.array(np.full(n, -1, np.int8()), pa.int8()),
                "val": batch[val_col].combine_chunks().cast(val_type),
            }
        )

    stamped_empty = pa.table(
        {
            "pp": pa.array([], pa.int32()),
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "slot": pa.array([], pa.int8()),
            "val": pa.nulls(0, val_type),
        }
    )

    def stamp_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return stamped_empty
        t = group.take(
            pc.sort_indices(
                group, sort_keys=[("k", "ascending"), ("slot", "ascending")]
            )
        )
        k = _np(t["k"])
        slot = _np(t["slot"])
        new = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        has_val = slot[starts] == -1
        pair_rows = np.flatnonzero((slot >= 0) & has_val[run_id])
        if len(pair_rows) == 0:
            return stamped_empty
        val_rows = starts[run_id[pair_rows]]
        a = t["a"].take(pa.array(pair_rows, pa.int64())).combine_chunks()
        b = t["b"].take(pa.array(pair_rows, pa.int64())).combine_chunks()
        pair_key = _mix64(
            a.to_numpy(zero_copy_only=False).astype(np.uint64)
        ) * _GOLDEN ^ b.to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "pp": _part_np(pair_key, n_parts),
                "a": a,
                "b": b,
                "slot": t["slot"].take(pa.array(pair_rows, pa.int64())),
                "val": t["val"].take(pa.array(val_rows, pa.int64())),
            }
        )

    joined_empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "val_a": pa.nulls(0, val_type),
            "val_b": pa.nulls(0, val_type),
        }
    )

    def reunite_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return joined_empty
        t = group.take(
            pc.sort_indices(
                group,
                sort_keys=[
                    ("a", "ascending"),
                    ("b", "ascending"),
                    ("slot", "ascending"),
                ],
            )
        )
        a = _np(t["a"])
        b = _np(t["b"])
        slot = _np(t["slot"])
        # first row of each (a, b, slot) group, then (a, b) runs over those
        firsts = np.flatnonzero(
            np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (slot[1:] != slot[:-1])]
        )
        fa, fb = a[firsts], b[firsts]
        pstart = np.flatnonzero(np.r_[True, (fa[1:] != fa[:-1]) | (fb[1:] != fb[:-1])])
        plen = np.diff(np.r_[pstart, len(firsts)])
        # slot ∈ {0, 1} sorted ascending ⇒ a complete pair is exactly a
        # run of two first-rows (slot 0 then slot 1); runs of one mean an
        # endpoint was absent from the value table — drop, as before
        ok = plen == 2
        if not ok.any():
            return joined_empty
        i0 = firsts[pstart[ok]]
        i1 = firsts[pstart[ok] + 1]
        return pa.table(
            {
                "a": t["a"].take(pa.array(i0, pa.int64())),
                "b": t["b"].take(pa.array(i0, pa.int64())),
                "val_a": t["val"].take(pa.array(i0, pa.int64())),
                "val_b": t["val"].take(pa.array(i1, pa.int64())),
            }
        )

    endpoints = pairs_ds.map_batches(explode, batch_format="pyarrow")
    tagged = values_ds.map_batches(tag_values, batch_format="pyarrow")
    stamped = (
        endpoints.union(tagged)
        .groupby("part")
        .map_groups(stamp_part, batch_format="pyarrow")
    )
    return stamped.groupby("pp").map_groups(reunite_part, batch_format="pyarrow")


def minhash_candidate_pairs(
    ds: rd.Dataset | None = None,
    text_col: str = "text",
    min_jaccard: float = 0.5,
    sig_ds: rd.Dataset | None = None,
) -> pa.Table:
    """MinHash-LSH near-dup pairs: shingle → signature → band buckets →
    candidate pairs → verify by signature agreement (estimated Jaccard) ≥ τ.

    Fully distributed: bucket pairs come from the coarse-partition kernel
    and verification joins signatures back via :func:`attach_pair_values` —
    a repartition join on doc_id, NOT a driver-side signature dict, so the
    path survives corpora whose signature table exceeds driver memory.

    Pass ``sig_ds`` (from :func:`minhash_signatures`) to reuse an already
    materialized signature table across queries.
    """
    if sig_ds is None:
        sig_ds = minhash_signatures(ds, text_col)
    n_parts = _auto_parts(sig_ds.count())

    # duplicate (a, b) rows from different buckets are NOT pre-deduped:
    # the verify join's reunite step collapses them per pair key anyway,
    # saving a whole groupby exchange
    pairs_ds = (
        sig_ds.map_batches(
            lambda b: _sigs_to_bands(b, n_parts), batch_format="pyarrow"
        )
        .groupby("part")
        .map_groups(_band_pairs_part, batch_format="pyarrow")
    )

    sig_type = pa.list_(pa.int64())
    joined = attach_pair_values(pairs_ds, sig_ds, "doc_id", "sig", sig_type, n_parts)

    def verify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "est_jaccard": pa.array([], pa.float64()),
                }
            )
        va = batch["val_a"].combine_chunks()
        vb = batch["val_b"].combine_chunks()
        ma = np.asarray(va.flatten(), dtype=np.int64).reshape(n, N_PERM)
        mb = np.asarray(vb.flatten(), dtype=np.int64).reshape(n, N_PERM)
        est = np.round((ma == mb).mean(axis=1), 6)
        out = pa.table(
            {
                "a": batch["a"],
                "b": batch["b"],
                "est_jaccard": pa.array(est, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["est_jaccard"], min_jaccard))

    tbl = _collect_sorted(
        joined.map_batches(verify, batch_format="pyarrow"), ["a", "b"]
    )
    if tbl is None:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "est_jaccard": pa.array([], pa.float64()),
            }
        )
    return tbl


def _collect_sorted(ds: rd.Dataset, keys: list[str]) -> pa.Table | None:
    """Materialize a (small, post-filter) result Dataset into one sorted
    Arrow table — the query-result boundary, not a mid-pipeline pull."""
    import ray

    parts = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return None
    tbl = pa.concat_tables(parts, promote_options="default")
    return tbl.take(pc.sort_indices(tbl, sort_keys=[(k, "ascending") for k in keys]))


# ---------------------------------------------------------------------------
# Connected components (min-label propagation)
# ---------------------------------------------------------------------------

_EMPTY_MSGS = pa.table(
    {
        "pp": pa.array([], pa.int32()),
        "node": pa.array([], pa.int64()),
        "label": pa.array([], pa.int64()),
        "own": pa.array([], pa.int8()),
    }
)

#: broadcast-vs-exchange switch for the CC singleton merge: below this many
#: converged edge-node labels the table ships via ray.put (a few tens of MB);
#: above it the corpus-wide min-merge exchange runs instead
_CC_BROADCAST_MAX = 5_000_000

_EMPTY_LABELS = pa.table(
    {
        "part": pa.array([], pa.int32()),
        "node": pa.array([], pa.int64()),
        "label": pa.array([], pa.int64()),
        "changed": pa.array([], pa.int64()),
    }
)


def connected_components_labels(
    pairs: pa.Table | rd.Dataset,
    ids_ds: rd.Dataset,
    id_col: str = "doc_id",
    max_iters: int = 64,
    n_parts: int | None = None,
    checkpoint_dir: "str | None" = None,
    resume: bool = False,
    stop_after: "int | None" = None,
) -> "rd.Dataset | None":
    """Iterated min-label propagation over the dup-pair graph →
    ``(doc_id, dup_group = min id of its component)`` for EVERY id in
    ``ids_ds`` (singletons keep their own id).

    The 10^9-doc scale path: labels and edges live in Datasets throughout.
    The iteration runs over the EDGE-NODE set only (nodes touched by at
    least one pair — the part that can change); singletons join in one
    final corpus-wide min-merge exchange instead of being re-shuffled
    every round.  Each iteration is one chained execution of two coarse
    ``groupby(part)`` exchanges whose partition kernels are fully
    vectorized (sort + run-boundary numpy, no per-group Python), plus a
    scalar ``sum(changed)`` convergence probe over the materialized label
    blocks.  Labels only ever decrease; LSH dup clusters are near-cliques,
    so practical iteration counts are 2-4; ``max_iters`` bounds
    adversarial chains.  The only driver traffic is the per-iteration
    changed-count scalar — the labels are returned as an (unsorted)
    Dataset so composing pipelines (e.g. the curation disposition
    exchange) keep them in the cluster; the sorted-table query boundary
    is :func:`connected_components_distributed`.

    With ``checkpoint_dir`` each superstep's label table commits
    atomically (the pagerank/kmeans tmp+rename contract — the 10^10-edge
    dedup case where losing 50 supersteps to a preemption is not
    acceptable); ``resume=True`` restarts from the latest committed
    superstep (the static edge layout is rebuilt from ``pairs``, cheap);
    labels only ever decrease, so the resumed trajectory is exact.
    ``stop_after=k`` simulates a kill after k supersteps (returns
    ``None``) — the conformance test's hook.
    """
    if isinstance(pairs, pa.Table):
        pairs = rd.from_arrow(pairs)

    def sym_edges(batch: pa.Table) -> pa.Table:
        a = batch["a"].combine_chunks()
        b = batch["b"].combine_chunks()
        src = pa.concat_arrays([a, b])
        return pa.table({"src": src, "dst": pa.concat_arrays([b, a])})

    edges = _drop_empty_blocks(
        pairs.map_batches(sym_edges, batch_format="pyarrow").materialize()
    )
    n_edges = edges.count()
    have_edges = n_edges > 0
    if n_parts is None:
        n_parts = _auto_parts(n_edges)

    labels = None
    if have_edges:

        def init_labels(batch: pa.Table) -> pa.Table:
            """Exchange-free label seed straight off the edge blocks: one
            (node=src, label=src) row per endpoint OCCURRENCE — the first
            iteration's min pass deduplicates per node for free, saving a
            whole distinct-nodes groupby."""
            src = batch["src"].combine_chunks()
            n = len(src)
            return pa.table(
                {
                    "part": _part_np(src.to_numpy(zero_copy_only=False), n_parts),
                    "node": src,
                    "label": src,
                    "changed": pa.array(np.zeros(n, np.int64), pa.int64()),
                }
            )

        labels = edges.map_batches(init_labels, batch_format="pyarrow").materialize()

        # static layout: edges grouped by src-part ONCE, looked up by
        # ObjectRef inside the stamp kernel every iteration after — only
        # the label table crosses the wire per superstep
        from anansi_ray.arrowds import fetch_part as _fetch_part
        from anansi_ray.arrowds import group_once as _group_once
        from anansi_ray.arrowds import refs_by_part as _refs_by_part

        def tag_edges(batch: pa.Table) -> pa.Table:
            src = batch["src"].combine_chunks()
            return pa.table(
                {
                    "part": _part_np(src.to_numpy(zero_copy_only=False), n_parts),
                    "src": src,
                    "dst": batch["dst"],
                }
            )

        edge_refs = _refs_by_part(
            _group_once(edges.map_batches(tag_edges, batch_format="pyarrow"))
        )

        def stamp_part(group: pa.Table) -> pa.Table:
            """One coarse partition of LABEL rows (edges come from the
            static layout by ref): every out-edge emits (dst, src's
            label), every node re-emits its own label (flagged ``own``
            for the convergence check downstream)."""
            if group.num_rows == 0:
                return _EMPTY_MSGS
            p = int(group["part"][0].as_py())
            node = _np(group["node"])
            lbl = _np(group["label"])
            order = np.argsort(node, kind="stable")
            node, lbl = node[order], lbl[order]
            # dedup per node (iteration 0 seeds one row per endpoint
            # occurrence, all with label == node, so run-first is exact)
            first = np.r_[True, node[1:] != node[:-1]]
            n_u, l_u = node[first], lbl[first]
            et = _fetch_part(edge_refs, p)
            if et is None:
                out_node, out_label = n_u, l_u
                own = np.ones(len(n_u), np.int8)
            else:
                src = _np(et["src"])
                dst = _np(et["dst"])
                # every src is an edge endpoint, so its label row is in
                # this same part by construction
                sl = l_u[np.searchsorted(n_u, src)]
                out_node = np.concatenate([n_u, dst])
                out_label = np.concatenate([l_u, sl])
                own = np.concatenate(
                    [np.ones(len(n_u), np.int8), np.zeros(len(dst), np.int8)]
                )
            return pa.table(
                {
                    "pp": _part_np(out_node, n_parts),
                    "node": pa.array(out_node, pa.int64()),
                    "label": pa.array(out_label, pa.int64()),
                    "own": pa.array(own, pa.int8()),
                }
            )

        def min_part(group: pa.Table) -> pa.Table:
            """One coarse partition of messages: per node-run, new label =
            min heard; ``changed`` = (new < node's own previous label)."""
            if group.num_rows == 0:
                return _EMPTY_LABELS
            t = group.take(
                pc.sort_indices(
                    group, sort_keys=[("node", "ascending"), ("label", "ascending")]
                )
            )
            node = _np(t["node"])
            label = _np(t["label"])
            own = _np(t["own"])
            new = np.r_[True, node[1:] != node[:-1]]
            starts = np.flatnonzero(new)
            run_id = np.cumsum(new) - 1
            new_lbl = label[starts]
            own_rows = np.flatnonzero(own == 1)
            # a run without an own row should never happen (every edge node
            # carries a label row); max-init keeps such a node iterating
            # rather than silently converging
            own_lbl = np.full(len(starts), np.iinfo(np.int64).max, dtype=np.int64)
            own_lbl[run_id[own_rows]] = label[own_rows]
            nodes = node[starts]
            return pa.table(
                {
                    "part": _part_np(nodes, n_parts),
                    "node": pa.array(nodes, pa.int64()),
                    "label": pa.array(new_lbl, pa.int64()),
                    "changed": pa.array(
                        (new_lbl < own_lbl).astype(np.int64), pa.int64()
                    ),
                }
            )

        start_iter = 0
        if checkpoint_dir is not None and resume:
            from anansi_ray.functions.graph import _latest_pr_checkpoint

            latest = _latest_pr_checkpoint(checkpoint_dir)
            if latest is not None:
                it0, path = latest
                labels = rd.read_parquet(
                    path, file_extensions=["parquet"]
                ).materialize()
                start_iter = it0 + 1

        for it in range(start_iter, max_iters):
            msgs = labels.groupby("part").map_groups(
                stamp_part, batch_format="pyarrow"
            )
            labels = _drop_empty_blocks(
                msgs.groupby("pp")
                .map_groups(min_part, batch_format="pyarrow")
                .materialize()
            )
            if checkpoint_dir is not None:
                from anansi_ray.functions.graph import _commit_pr_checkpoint

                _commit_pr_checkpoint(
                    checkpoint_dir, it, labels, {"n_parts": n_parts}
                )
            if not labels.sum("changed"):
                break
            if stop_after is not None and it + 1 >= stop_after:
                return None  # simulated kill between supersteps

    # singleton merge — two shapes, picked by the size of the converged
    # edge-node label table (bounded by the dup-pair ENDPOINTS, not the
    # corpus):
    #   small  → broadcast (ray.put sorted arrays) + one narrow map over
    #            the corpus ids with a vectorized searchsorted lookup —
    #            no exchange at all (the standard broadcast-join shape)
    #   large  → corpus-wide min-merge exchange (the general path)
    import ray as _ray

    n_labels = labels.count() if have_edges else 0
    if n_labels <= _CC_BROADCAST_MAX:
        if n_labels:
            lt = pa.concat_tables(
                [t for t in _ray.get(labels.to_arrow_refs()) if t.num_rows],
                promote_options="default",
            )
            ln = _np(lt["node"])
            ll = _np(lt["label"])
            order = np.argsort(ln)
            ln, ll = ln[order], ll[order]
        else:
            ln = ll = np.empty(0, dtype=np.int64)
        ref = _ray.put((ln, ll))

        def stamp_ids(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].combine_chunks().cast(pa.int64())
            iv = ids.to_numpy(zero_copy_only=False)
            ln_, ll_ = _ray.get(ref)
            if len(ln_) == 0:
                lab = iv
            else:
                pos = np.clip(np.searchsorted(ln_, iv), 0, len(ln_) - 1)
                lab = np.where(ln_[pos] == iv, ll_[pos], iv)
            return pa.table(
                {"doc_id": ids, "dup_group": pa.array(lab, pa.int64())}
            )

        return ids_ds.map_batches(stamp_ids, batch_format="pyarrow")

    def tag_ids(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks().cast(pa.int64())
        n = len(ids)
        return pa.table(
            {
                "part": _part_np(ids.to_numpy(zero_copy_only=False), n_parts),
                "node": ids,
                "label": ids,
                "isv": pa.array(np.zeros(n, np.int8), pa.int8()),
            }
        )

    merged = ids_ds.map_batches(tag_ids, batch_format="pyarrow")
    if have_edges:

        def tag_final(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "part": batch["part"],
                    "node": batch["node"],
                    "label": batch["label"],
                    "isv": pa.array(np.ones(n, np.int8), pa.int8()),
                }
            )

        merged = merged.union(labels.map_batches(tag_final, batch_format="pyarrow"))

    final_empty = pa.table(
        {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
    )

    def final_min(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return final_empty
        t = group.take(
            pc.sort_indices(
                group,
                sort_keys=[
                    ("node", "ascending"),
                    ("label", "ascending"),
                    ("isv", "ascending"),
                ],
            )
        )
        node = _np(t["node"])
        label = _np(t["label"])
        isv = _np(t["isv"])
        new = np.r_[True, node[1:] != node[:-1]]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        # a node only belongs in the output if ids_ds contains it (isv==0
        # somewhere in its run) — edge endpoints outside ids_ds drop, as in
        # the round-2 semantics
        in_ids = np.zeros(len(starts), dtype=bool)
        in_ids[run_id[isv == 0]] = True
        keep = starts[in_ids]
        return pa.table(
            {
                "node": pa.array(node[keep], pa.int64()),
                "label": pa.array(label[keep], pa.int64()),
            }
        )

    out = merged.groupby("part").map_groups(final_min, batch_format="pyarrow")
    return out.map_batches(
        lambda b: b.rename_columns(["doc_id", "dup_group"]),
        batch_format="pyarrow",
    )


def connected_components_distributed(
    pairs: pa.Table | rd.Dataset,
    ids_ds: rd.Dataset,
    id_col: str = "doc_id",
    max_iters: int = 64,
    n_parts: int | None = None,
) -> pa.Table:
    """Sorted-table boundary over :func:`connected_components_labels` —
    the query-result contract.  Pipelines that compose the labels
    downstream (curation disposition, incremental dedup) use the Dataset
    form directly and never pull the corpus-cardinality table."""
    tbl = _collect_sorted(
        connected_components_labels(pairs, ids_ds, id_col, max_iters, n_parts),
        ["doc_id"],
    )
    if tbl is None:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "dup_group": pa.array([], pa.int64())}
        )
    return tbl


def connected_components(pairs: pa.Table, all_ids) -> pa.Table:
    """Union-find over candidate pairs → (doc_id, dup_group = min id of its
    component).  Driver-side small-scale reference implementation — the
    pipeline path is :func:`connected_components_distributed`; a pytest
    asserts their outputs are identical."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(x: int, y: int) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry

    for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()):
        union(int(a), int(b))
    ids = sorted(int(i) for i in all_ids)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "dup_group": pa.array([find(i) for i in ids], pa.int64()),
        }
    )


def ngram_jaccard(text_a: str, text_b: str, w: int = 3) -> float:
    """Exact token n-gram Jaccard (the verify primitive for LSH candidates)."""
    sa, sb = set(_shingle_hashes(text_a, w)), set(_shingle_hashes(text_b, w))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# per-process token→sha256-prefix memo (simhash MUST stay sha256: the DuckDB
# oracle recomputes the identical signature from sha256(token))
_SIM_TOK_CACHE: dict[str, int] = {}
_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over \\w+ tokens (unit weights).

    Token hash = first 8 bytes of SHA-256, big-endian — chosen (over
    blake2b) so a DuckDB oracle can recompute the identical signature with
    ``('0x' || substr(sha256(tok), 1, 16))::UBIGINT``.  Bit accumulation is
    vectorized over the DISTINCT tokens (occurrence counts as weights —
    identical to the per-occurrence ±1 sum).
    """
    toks = _TOKEN.findall((text or "").lower())
    if not toks:
        return 0
    cache = _SIM_TOK_CACHE
    hs = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            if len(cache) >= _TOK_CACHE_MAX:
                cache.clear()
            h = int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "big")
            cache[t] = h
        hs[i] = h
    uniq, counts = np.unique(hs, return_counts=True)
    bits = ((uniq[:, None] >> _SHIFTS[None, :]) & 1).astype(np.int64)
    acc = ((2 * bits - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    return int.from_bytes(
        np.packbits(acc > 0, bitorder="little").tobytes(), "little"
    )


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = [simhash64(t) for t in batch[text_col].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array([f"{v:016x}" for v in vals], pa.string()),
        }
    )


_EMPTY_HAM = pa.table(
    {
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
        "hamming": pa.array([], pa.int32()),
    }
)


def simhash_near_dup_pairs(
    ds: rd.Dataset, max_hamming: int = 3, n_parts: int | None = None
) -> pa.Table:
    """Near-dup pairs with hamming(simhash) ≤ d via 4-piece pigeonhole
    bucketing (any pair within distance 3 shares at least one 16-bit piece).

    Bucket enumeration runs in coarse-partition kernels (sort + run walk)
    and the final per-(a, b) dedup is a distributed ``groupby`` min — the
    driver only receives the post-filter pair table.
    """
    sh = ds.map_batches(simhash_batch, batch_format="pyarrow").materialize()
    nb = _auto_parts(sh.count())
    if n_parts is None:
        n_parts = nb
    if sh.num_blocks() > nb:
        sh = sh.repartition(nb).materialize()

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "pkey": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.int64()),
                }
            )
        ids = np.asarray(_np(batch["doc_id"]), dtype=np.int64)
        vals = np.asarray(
            [int(h, 16) for h in batch["simhash"].to_pylist()], dtype=np.uint64
        )
        # 4 piece rows per doc; bucket key = piece index ⊕ piece value
        piece = np.repeat(np.arange(4, dtype=np.uint64), n)
        pv = np.concatenate([(vals >> np.uint64(16 * p)) & np.uint64(0xFFFF) for p in range(4)])
        pkey = (piece << np.uint64(16)) | pv
        return pa.table(
            {
                "part": _part_np(pkey, n_parts),
                "pkey": pa.array(pkey.view(np.int64), pa.int64()),
                "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
                "sim": pa.array(np.tile(vals, 4).view(np.int64), pa.int64()),
            }
        )

    def pairs_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _EMPTY_HAM
        t = group.take(
            pc.sort_indices(
                group, sort_keys=[("pkey", "ascending"), ("doc_id", "ascending")]
            )
        )
        pk = _np(t["pkey"])
        ids = _np(t["doc_id"])
        sims = _np(t["sim"]).view(np.uint64)
        new = np.r_[True, pk[1:] != pk[:-1]]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, len(pk)])
        multi = lens >= 2
        if not multi.any():
            return _EMPTY_HAM
        a_l, b_l, d_l = [], [], []
        for s, l in zip(starts[multi], lens[multi]):
            run_ids = ids[s : s + l]
            run_sims = sims[s : s + l]
            ai, bi = np.triu_indices(l, k=1)
            ham = _popcount64(run_sims[ai] ^ run_sims[bi])
            hit = ham <= max_hamming
            a_l.append(run_ids[ai[hit]])
            b_l.append(run_ids[bi[hit]])
            d_l.append(ham[hit].astype(np.int32))
        a = np.concatenate(a_l)
        if len(a) == 0:
            return _EMPTY_HAM
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(np.concatenate(b_l), pa.int64()),
                "hamming": pa.array(np.concatenate(d_l), pa.int32()),
            }
        )

    def dedup_part(group: pa.Table) -> pa.Table:
        """Per-(a, b) min-hamming, vectorized — the distributed replacement
        for the round-2 driver-side pandas groupby."""
        if group.num_rows == 0:
            return _EMPTY_HAM
        t = group.take(
            pc.sort_indices(
                group,
                sort_keys=[
                    ("a", "ascending"),
                    ("b", "ascending"),
                    ("hamming", "ascending"),
                ],
            )
        )
        a = _np(t["a"])
        b = _np(t["b"])
        firsts = np.flatnonzero(np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        idx = pa.array(firsts, pa.int64())
        return pa.table(
            {
                "a": t["a"].take(idx),
                "b": t["b"].take(idx),
                "hamming": t["hamming"].take(idx),
            }
        )

    def repart(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("pp", pa.array([], pa.int32()))
        key = _mix64(_np(batch["a"]).astype(np.uint64)) * _GOLDEN ^ _np(
            batch["b"]
        ).astype(np.uint64)
        return batch.append_column("pp", _part_np(key, n_parts))

    out = (
        sh.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_part, batch_format="pyarrow")
        .map_batches(repart, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(
            lambda g: dedup_part(g.drop_columns(["pp"])), batch_format="pyarrow"
        )
    )
    tbl = _collect_sorted(out, ["a", "b"])
    if tbl is None:
        return _EMPTY_HAM
    return tbl


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (exact brute force; oracle-checkable)
# ---------------------------------------------------------------------------


def _emb_np(tbl: pa.Table, emb_col: str = "embedding") -> np.ndarray:
    """list<float> column → (n, dim) float64 via Arrow flatten + reshape —
    no per-row Python materialization (to_pylist builds n·dim objects)."""
    col = tbl[emb_col].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(tbl.num_rows, -1)


def embedding_near_dup_pairs(
    ds: rd.Dataset, threshold: float = 0.95, id_col: str = "vec_id"
) -> pa.Table:
    """Exact cosine near-dup pairs: blockwise matmul of each batch against
    the broadcast L2-normalized full matrix.

    Broadcast works to ~10^6×dim on a worker; beyond that use the IVF path
    (functions/similarity.py) to restrict comparisons to shared cells.
    """
    import ray

    full = ds.select_columns([id_col, "embedding"]).materialize()
    tbl = pa.concat_tables(ray.get(full.to_arrow_refs()), promote_options="default")
    if id_col not in tbl.column_names:
        # all-empty input: blocks are schema-less, no pairs exist
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    ids = tbl[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    mat = _emb_np(tbl)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.maximum(norms, 1e-12)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    ref = ray.put((ids, mat))

    def block(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        b_ids = (
            batch[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        b_mat = _emb_np(batch)
        b_mat = b_mat / np.maximum(np.linalg.norm(b_mat, axis=1, keepdims=True), 1e-12)
        sims = b_mat @ all_mat.T
        rows, cols = np.nonzero(sims >= threshold)
        keep = b_ids[rows] < all_ids[cols]
        rows, cols = rows[keep], cols[keep]
        return pa.table(
            {
                "a": pa.array(b_ids[rows], pa.int64()),
                "b": pa.array(all_ids[cols], pa.int64()),
                "cosine": pa.array(np.round(sims[rows, cols], 6), pa.float64()),
            }
        )

    out = ds.map_batches(block, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    out = out.sort_values(["a", "b"])
    return pa.Table.from_pandas(out, preserve_index=False)


# fixed-point scale for the hyperplane sign test: both the pipeline and the
# single-threaded oracle twin quantize the normalized vectors AND the planes
# to integers, so the bucket bit is an EXACT int64 dot-product sign —
# identical under any batching/blocking (float matmul sign at ~0 is not)
_LSH_Q = 1 << 20


def lsh_planes(dim: int, n_tables: int = 8, n_bits: int = 6, seed: int = 42):
    """Deterministic quantized hyperplanes (n_tables, n_bits, dim) int64."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_bits, dim))
    return np.round(planes * _LSH_Q).astype(np.int64)


def normalize_rows(mat: np.ndarray) -> np.ndarray:
    """Row-L2 normalization (shared per-record math for pipeline + twin)."""
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def lsh_bucket_sigs(mat_norm: np.ndarray, qplanes: np.ndarray) -> np.ndarray:
    """(n, n_tables) int64 bucket signatures via exact integer sign bits."""
    q = np.round(mat_norm * _LSH_Q).astype(np.int64)  # (n, dim)
    n_tables, n_bits, _dim = qplanes.shape
    sigs = np.empty((q.shape[0], n_tables), dtype=np.int64)
    weights = 1 << np.arange(n_bits, dtype=np.int64)
    for t in range(n_tables):
        bits = (q @ qplanes[t].T) > 0  # exact integer arithmetic
        sigs[:, t] = bits @ weights
    return sigs


def pair_cosine(a: np.ndarray, b: np.ndarray) -> float:
    """Per-pair cosine of two already-normalized rows — a single ddot with
    identical memory layout on both the pipeline and oracle side, so the
    rounded value is reproducible."""
    return float(np.round(np.dot(a, b), 6))


_EMPTY_COS = pa.table(
    {
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
        "cosine": pa.array([], pa.float64()),
    }
)


def embedding_near_dup_lsh(
    ds: rd.Dataset,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    n_bits: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> pa.Table:
    """Scale path for embedding near-dup: random-hyperplane LSH bucketing.

    Each vector gets ``n_tables`` signatures of ``n_bits`` sign bits
    (broadcast quantized projection matrix — see :func:`lsh_bucket_sigs`:
    the sign test is exact integer arithmetic, so bucket membership is
    deterministic under any batching); vectors sharing a (table, signature)
    bucket become candidates; candidates are verified by exact per-pair
    cosine within the bucket group.  No all-pairs pass — the only shuffles
    are the bucket groupby and the final per-pair dedup, so this survives
    corpora where the broadcast matrix of :func:`embedding_near_dup_pairs`
    cannot fit.

    Approximate: pairs whose vectors collide in no table are missed
    (recall rises with n_tables; p_miss = (1 - p_same_bucket)^n_tables).
    The single-threaded oracle twin (queries._emb_lsh_pairs_local) shares
    the per-record math and reproduces the output exactly.
    """
    import ray

    first = ds.limit(1).to_pandas()
    if len(first) == 0:
        # empty corpus: no buckets, no candidate pairs
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    dim = len(first["embedding"].iloc[0])
    planes_ref = ray.put(lsh_planes(dim, n_tables, n_bits, seed))

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids = (
            batch[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        mat = normalize_rows(_emb_np(batch))
        sigs = lsh_bucket_sigs(mat, pl)  # (n, n_tables)
        n, nt = sigs.shape
        return pa.table(
            {
                "table_id": pa.array(
                    np.repeat(np.arange(nt, dtype=np.int32), n), pa.int32()
                ),
                "sig": pa.array(sigs.T.reshape(-1), pa.int64()),
                id_col: pa.array(np.tile(ids, nt), pa.int64()),
                "vec": pa.array(np.tile(mat, (nt, 1)).tolist(), pa.list_(pa.float64())),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _EMPTY_COS
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        mat = np.asarray(group["vec"].to_pylist(), dtype=np.float64)
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        # float matmul prefilter with margin, then exact per-pair ddot so
        # the reported value (and the τ decision) is batching-independent
        sims = mat @ mat.T
        iu, ju = np.triu_indices(n, k=1)
        near = sims[iu, ju] >= threshold - 1e-9
        a_l, b_l, c_l = [], [], []
        for i, j in zip(iu[near], ju[near]):
            c = pair_cosine(mat[i], mat[j])
            if c >= threshold:
                a_l.append(int(ids[i]))
                b_l.append(int(ids[j]))
                c_l.append(c)
        return pa.table(
            {
                "a": pa.array(a_l, pa.int64()),
                "b": pa.array(b_l, pa.int64()),
                "cosine": pa.array(c_l, pa.float64()),
            }
        )

    def repart(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("pp", pa.array([], pa.int32()))
        key = _mix64(_np(batch["a"]).astype(np.uint64)) * _GOLDEN ^ _np(
            batch["b"]
        ).astype(np.uint64)
        return batch.append_column("pp", _part_np(key, 16))

    def dedup_part(group: pa.Table) -> pa.Table:
        """First row per (a, b) — cosines are identical across tables by
        construction, so 'first' is well-defined."""
        if group.num_rows == 0:
            return _EMPTY_COS
        t = group.drop_columns(["pp"])
        t = t.take(
            pc.sort_indices(t, sort_keys=[("a", "ascending"), ("b", "ascending")])
        )
        a = _np(t["a"])
        b = _np(t["b"])
        firsts = np.flatnonzero(np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        return t.take(pa.array(firsts, pa.int64()))

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["table_id", "sig"])
        .map_groups(verify, batch_format="pyarrow")
        .map_batches(repart, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(dedup_part, batch_format="pyarrow")
    )
    tbl = _collect_sorted(out, ["a", "b"])
    if tbl is None:
        return _EMPTY_COS
    return tbl


# ---------------------------------------------------------------------------
# Passage-level dedup (repeated-boilerplate removal)
# ---------------------------------------------------------------------------


def passage_explode(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
) -> pa.Table:
    """Explode documents into fixed-width word passages.

    One row per ``chunk_words``-word passage: ``(chunk, order_key)`` where
    ``order_key = doc_id || ':' || zero-padded chunk index`` — a single
    string whose lexicographic order equals the (doc_id, chunk_index)
    tuple order, so a plain ``min`` aggregate identifies the corpus-wide
    first occurrence of each distinct passage.

    Vectorized: ``pc.split_pattern`` → ``list_flatten`` + offsets, chunk
    assignment by integer division on word positions, passage strings
    re-joined with one pandas ``groupby(...).agg(' '.join)`` C-loop pass —
    no per-row Python in the driver or the kernel."""
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
    n = len(counts)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    starts = np.cumsum(counts) - counts
    pos = np.arange(len(words), dtype=np.int64) - np.repeat(starts, counts)
    ci = pos // chunk_words
    gkey = doc_idx * 1_000_000 + ci
    chunks = pd.Series(words, dtype=object).groupby(gkey, sort=True).agg(" ".join)
    gk = chunks.index.to_numpy()
    d_i = gk // 1_000_000
    c_i = gk % 1_000_000
    ids = _np(batch[id_col])
    if ids.dtype.kind in "iu":
        # zero-pad numeric ids so the composed key's lexicographic order
        # equals the numeric (doc_id, ci) tuple order
        id_str = pd.Series(ids[d_i]).astype(str).str.zfill(12)
    else:
        id_str = pd.Series(ids.astype(object)[d_i], dtype=object)
    order_key = id_str + ":" + pd.Series(c_i).astype(str).str.zfill(6)
    return pa.table(
        {
            "chunk": pa.array(chunks.to_numpy(), pa.string()),
            "order_key": pa.array(order_key.to_numpy(), pa.string()),
        }
    )


def passage_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
    n_parts: int = 64,
) -> rd.Dataset:
    """Corpus-wide passage dedup (C4/Gopher-style repeated-boilerplate
    removal): split every document into ``chunk_words``-word passages,
    keep only the corpus-wide FIRST occurrence (by (doc_id, chunk index))
    of each distinct passage, and reassemble the surviving passages into
    per-document text.  Documents whose every passage was seen earlier
    disappear entirely.

    Shape (two exchanges, both on uniform keys):

    1. ``map_batches(passage_explode)`` — per-batch vectorized explode.
    2. ``groupby(chunk).min(order_key)`` — the min row IS the survivor
       (order_key encodes its own (doc, position) identity), so no join
       back is needed; the exchange carries one row per distinct passage.
    3. reassembly — survivors exchange once on ``part = hash(doc_id) %
       n_parts`` (coarse partitions, not per-doc micro-groups); each
       partition kernel sorts once by (doc_id, ci) and rebuilds every
       doc's text in one pandas ``groupby.agg`` pass.

    At 100 TB: passage rows are ~chunk-sized strings on a uniform hash
    key; stage 2's output is bounded by the number of DISTINCT passages
    (boilerplate-heavy corpora shrink hard); reassembly partitions are
    corpus/n_parts-sized."""
    import pandas as pd

    id_is_int = pa.types.is_integer(ds.schema().base_schema.field(id_col).type)
    id_type = pa.int64() if id_is_int else pa.string()

    exploded = ds.map_batches(
        lambda b: passage_explode(b, text_col, id_col, chunk_words),
        batch_format="pyarrow",
    )
    survivors = exploded.groupby("chunk").min("order_key")

    def tag(b: pa.Table) -> pa.Table:
        ok = b["min(order_key)"] if "min(order_key)" in b.column_names else b["order_key"]
        if isinstance(ok, pa.ChunkedArray):
            ok = ok.combine_chunks()
        s = ok.to_pandas()
        split = s.str.rsplit(":", n=1, expand=True)
        ci = split[1].astype(np.int64).to_numpy()
        if id_is_int:
            did = split[0].astype(np.int64).to_numpy()
            part = (did % n_parts).astype(np.int32)
        else:
            did = split[0].to_numpy()
            part = (
                pd.util.hash_array(did.astype(object)) % np.uint64(n_parts)
            ).astype(np.int32)
        return pa.table(
            {
                "part": pa.array(part, pa.int32()),
                id_col: pa.array(did, id_type),
                "ci": pa.array(ci, pa.int64()),
                "chunk": b["chunk"],
            }
        )

    def reassemble(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], id_type), text_col: pa.array([], pa.string())}
            )
        t = group.take(
            pc.sort_indices(
                group, sort_keys=[(id_col, "ascending"), ("ci", "ascending")]
            )
        )
        dids = _np(t[id_col])
        if not id_is_int:
            dids = dids.astype(object)
        chunks = _np(t["chunk"]).astype(object)
        joined = pd.Series(chunks, dtype=object).groupby(dids, sort=True).agg(" ".join)
        return pa.table(
            {
                id_col: pa.array(joined.index.to_numpy(), id_type),
                text_col: pa.array(joined.to_numpy(), pa.string()),
            }
        )

    return (
        survivors.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reassemble, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Exact set-similarity threshold join (PPJoin-style prefix filtering)
# ---------------------------------------------------------------------------


def _shingle_part(col, n_parts: int) -> pa.Array:
    import pandas as pd

    h = pd.util.hash_array(col.to_pandas().to_numpy(dtype=object))
    return pa.array((h % n_parts).astype(np.int32), pa.int32())


_STAMPED_EMPTY = pa.table(
    {
        "doc_id": pa.array([], pa.int64()),
        "sh": pa.array([], pa.string()),
        "df": pa.array([], pa.int64()),
    }
)


def shingle_stamped(
    docs_ds: rd.Dataset, k: int = 3, n_parts: int = 32
) -> rd.Dataset:
    """The df-stamped distinct (doc_id, sh, df) shingle table: per-batch
    distinct (doc, shingle) combiner → ONE shingle-hash exchange whose
    kernel stamps global df in-run (rows are globally distinct and every
    row of a shingle co-locates, so df == run length — no counting
    aggregate over the string key domain).  THRESHOLD- and
    SIM-independent, so joins at different thresholds/measures share one
    build (the query registry memoizes it per sf_dir)."""
    import pandas as pd

    from anansi_ray.arrowds import drop_empty_blocks
    from anansi_ray.functions import text as ftext

    def doc_shingles(b: pa.Table) -> pa.Table:
        ridx, sh = ftext.shingles_for_batch(b, k=k)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"doc_id": ids[ridx], "sh": np.asarray(sh, dtype=object)}
        ).drop_duplicates()
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
                "sh": pa.array(df["sh"].to_numpy(dtype=object), pa.string()),
            }
        )

    def tag_pairs(b: pa.Table) -> pa.Table:
        return b.append_column("part", _shingle_part(b["sh"], n_parts))

    def stamp_df(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _STAMPED_EMPTY
        pdf = g.to_pandas().sort_values(["sh", "doc_id"], kind="stable")
        sh = pdf["sh"].to_numpy(dtype=object)
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        sizes = np.diff(np.r_[starts, len(sh)])
        dfv = np.repeat(sizes, sizes).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(
                    pdf["doc_id"].to_numpy(dtype=np.int64), pa.int64()
                ),
                "sh": pa.array(sh, pa.string()),
                "df": pa.array(dfv, pa.int64()),
            }
        )

    # every doc lives in one batch → per-batch dedup is globally distinct
    return drop_empty_blocks(
        docs_ds.map_batches(doc_shingles, batch_format="pyarrow")
        .map_batches(tag_pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(stamp_df, batch_format="pyarrow")
        .materialize()
    )


def shingle_jaccard_pairs(
    docs_ds: rd.Dataset,
    t_num: int = 6,
    t_den: int = 10,
    k: int = 3,
    n_parts: int = 32,
    new_pred=None,
    sim: str = "jaccard",
    stamped: "rd.Dataset | None" = None,
) -> pa.Table | None:
    """EXACT Jaccard-threshold join over k-token shingle sets — complete by
    construction (prefix-filter lemma), unlike the probabilistic LSH path.

    Under a global shingle order (df asc, shingle asc), J(A,B) ≥ t implies
    |A∩B| ≥ ⌈t·|A|⌉ and ≥ ⌈t·|B|⌉, so the first |X| − ⌈t·|X|⌉ + 1
    shingles of each side must share an element — only those PREFIX
    shingles (the rarest ones) generate candidates, bounding the
    per-shingle pair blow-up by rare-shingle df, not corpus df.

    ``new_pred(ids) -> bool array`` restricts candidates to CROSS pairs
    (exactly one side satisfies the predicate) — the incremental-ingest
    shape: a new shard joins against the standing corpus and corpus×corpus
    pairs are never enumerated, so the cost per ingest scales with the
    new shard, not the corpus.

    Pipeline: per-batch distinct (doc, shingle) combiner → ONE shingle-hash
    exchange stamping global df in-kernel (rows per shingle are globally
    distinct and co-located after the exchange, so df = run length — no
    separate counting aggregate over the string key domain) → doc exchange
    computing per-doc prefixes → shingle-hash exchange enumerating
    size-filtered prefix pairs (t_den·min ≥ t_num·max prune) →
    attach_pair_values repartition join → per-pair exact verify with the
    integer test t_den·I ≥ t_num·U.

    ``sim="overlap"`` switches the measure to the OVERLAP COEFFICIENT
    I/min(|A|,|B|) — the containment join that catches a short document
    quoted inside a long one, where Jaccard is diluted by the long side's
    size.  The prefix lemma then pigeonholes only the SMALLER side (any
    ≥⌈t·|A|⌉-subset of A hits A's first |A|−⌈t·|A|⌉+1 shingles), so
    candidates pair prefix rows against ALL co-bucketed rows of
    equal-or-larger docs (no size-ratio prune exists — a tiny doc can be
    contained in any doc), and the verify test is t_den·I ≥ t_num·min.
    Returns (a, b, jaccard|overlap) sorted, or None when no pair
    qualifies."""
    if sim not in ("jaccard", "overlap"):
        raise ValueError(f"sim must be jaccard|overlap, got {sim!r}")
    overlap = sim == "overlap"
    import pandas as pd

    from anansi_ray.arrowds import drop_empty_blocks
    from anansi_ray.functions import text as ftext

    if stamped is None:
        stamped = shingle_stamped(docs_ds, k=k, n_parts=n_parts)

    def _sh_part(col) -> pa.Array:
        return _shingle_part(col, n_parts)

    def tag_doc(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "part", pa.array((d % n_parts).astype(np.int32), pa.int32())
        )

    prefix_empty = pa.table(
        {
            "sh": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "pref": pa.array([], pa.bool_()),
        }
    )

    def prefix_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return prefix_empty
        pdf = g.to_pandas().sort_values(["doc_id", "df", "sh"], kind="stable")
        d = pdf["doc_id"].to_numpy()
        n_rows = len(d)
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        sizes = np.diff(np.r_[starts, n_rows])
        n_per = np.repeat(sizes, sizes)
        pos = np.arange(n_rows) - np.repeat(starts, sizes)
        alpha = (t_num * n_per + t_den - 1) // t_den  # ceil(t n)
        pref = pos < (n_per - alpha + 1)
        # jaccard pairs prefix×prefix, so non-prefix rows never travel;
        # overlap pairs prefix×ALL, so every row travels with its flag
        keep = np.ones(n_rows, bool) if overlap else pref
        return pa.table(
            {
                "sh": pa.array(
                    pdf["sh"].to_numpy(dtype=object)[keep], pa.string()
                ),
                "doc_id": pa.array(d[keep], pa.int64()),
                "n": pa.array(n_per[keep].astype(np.int64), pa.int64()),
                "pref": pa.array(pref[keep], pa.bool_()),
            }
        )

    prefixes = drop_empty_blocks(
        stamped.map_batches(tag_doc, batch_format="pyarrow")
        .groupby("part")
        .map_groups(prefix_part, batch_format="pyarrow")
        .materialize()
    )

    cand_empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )

    def enum_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return cand_empty
        pdf = g.to_pandas()
        if overlap:
            # prefix(smaller) × all(equal-or-larger): the pigeonholed
            # shared shingle is in the SMALL side's prefix and anywhere
            # in the large side
            m = pdf[pdf["pref"]].merge(pdf, on="sh")
            m = m[
                (m["doc_id_x"] != m["doc_id_y"])
                & (m["n_x"].to_numpy() <= m["n_y"].to_numpy())
            ]
            dx, dy = m["doc_id_x"].to_numpy(), m["doc_id_y"].to_numpy()
            lo_id, hi_id = np.minimum(dx, dy), np.maximum(dx, dy)
            ab = np.unique(lo_id * np.int64(1 << 31) + hi_id)
        else:
            m = pdf.merge(pdf, on="sh")
            m = m[m["doc_id_x"] < m["doc_id_y"]]
            lo = np.minimum(m["n_x"].to_numpy(), m["n_y"].to_numpy())
            hi = np.maximum(m["n_x"].to_numpy(), m["n_y"].to_numpy())
            m = m[t_den * lo >= t_num * hi]
            if new_pred is not None:
                # incremental shape: exactly one side is from the new shard
                nx = new_pred(m["doc_id_x"].to_numpy())
                ny = new_pred(m["doc_id_y"].to_numpy())
                m = m[nx != ny]
            ab = np.unique(
                m["doc_id_x"].to_numpy() * np.int64(1 << 31)
                + m["doc_id_y"].to_numpy()
            )
        return pa.table(
            {
                "a": pa.array(ab >> 31, pa.int64()),
                "b": pa.array(ab & ((1 << 31) - 1), pa.int64()),
            }
        )

    def tag_sh_only(b: pa.Table) -> pa.Table:
        return b.append_column("part", _sh_part(b["sh"]))

    cands = drop_empty_blocks(
        prefixes.map_batches(tag_sh_only, batch_format="pyarrow")
        .groupby("part")
        .map_groups(enum_pairs, batch_format="pyarrow")
        .materialize()
    )

    joined = attach_pair_values(
        cands, docs_ds, "doc_id", "text", pa.string(), n_parts=n_parts
    )

    sim_col = "overlap" if overlap else "jaccard"

    def verify(batch: pa.Table) -> pa.Table:
        a_out, b_out, j_out = [], [], []
        for a, b, ta, tb in zip(
            batch["a"].to_pylist(),
            batch["b"].to_pylist(),
            batch["val_a"].to_pylist(),
            batch["val_b"].to_pylist(),
        ):
            sa = set(_shingle_hashes(ta, k))
            sb = set(_shingle_hashes(tb, k))
            inter = len(sa & sb)
            denom = min(len(sa), len(sb)) if overlap else len(sa | sb)
            if denom > 0 and t_den * inter >= t_num * denom:
                a_out.append(a)
                b_out.append(b)
                j_out.append(round(inter / denom, 6))
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                sim_col: pa.array(j_out, pa.float64()),
            }
        )

    return _collect_sorted(
        joined.map_batches(verify, batch_format="pyarrow"), ["a", "b"]
    )
