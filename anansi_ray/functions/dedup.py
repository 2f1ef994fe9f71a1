"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All expressed Ray-Data-first:

* exact      — hash inside ``map_batches`` (partial), then one
               ``groupby(text_hash)`` shuffle keeping min doc_id
* MinHash    — shingle→minhash signature per batch (vectorized numpy
               universal hashing), explode to (band, band_hash, doc_id)
               rows, ``groupby`` band buckets → candidate pairs → verify by
               signature agreement (estimated Jaccard) → connected
               components
* SimHash    — 64-bit signature + pigeonhole piece-bucketing for
               hamming-distance candidates
* embedding  — brute-force blockwise cosine vs a broadcast normalized
               matrix (exact; the SQL-oracle-checkable path) — the IVF/LSH
               scale path lives in functions/similarity.py

Scale notes: every shuffle is on a uniformly-distributed hash key
(text_hash, band_hash, doc_id, pair id) — the same pattern as the crawl
dedup (SURVEY §2.8).  MinHash verification joins signatures back through
the distributed repartition join (:func:`attach_pair_values`) and
connected components run as iterated min-label propagation over Datasets
(:func:`connected_components_distributed`); the driver-side union-find
remains only as the small-scale reference the equality tests pin against.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_TOKEN = re.compile(r"\w+", re.UNICODE)

# MinHash parameters: 128 permutations = 32 bands × 4 rows
# (LSH threshold ≈ (1/32)^(1/4) ≈ 0.42 Jaccard)
N_PERM = 128
N_BANDS = 32
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1


def _perm_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, N_PERM, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, N_PERM, dtype=np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


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
    """
    hashed = ds.map_batches(
        lambda b: text_hash_batch(b, text_col).select(["text_hash", id_col]),
        batch_format="pyarrow",
    )

    def keep_min(group: pa.Table) -> pa.Table:
        m = pc.min_max(group[id_col])["min"]
        return pa.table(
            {"text_hash": group["text_hash"][:1], id_col: pa.array([m.as_py()])}
        )

    return hashed.groupby("text_hash").map_groups(keep_min, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, w: int = 3) -> np.ndarray:
    """Token w-gram shingles → stable 61-bit hashes."""
    toks = _TOKEN.findall((text or "").lower())
    if len(toks) < w:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)]
    out = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
            & _MERSENNE
            for g in grams
        ),
        dtype=np.uint64,
        count=len(grams),
    )
    return np.unique(out)


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


def minhash_bands_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per batch: signatures exploded to (band_id, band_hash, doc_id) rows —
    the pre-shuffle partial of the LSH bucketing.  Keys only: shipping the
    full 128-perm signature with every band row would inflate the shuffle
    32×; verification joins signatures back afterwards."""
    ids = batch["doc_id"].to_pylist()
    sigs = [minhash_signature(t) for t in batch[text_col].to_pylist()]
    band_ids, band_hashes, doc_ids = [], [], []
    for doc, sig in zip(ids, sigs):
        bands = sig.reshape(N_BANDS, ROWS_PER_BAND)
        for b in range(N_BANDS):
            band_ids.append(b)
            band_hashes.append(
                hashlib.blake2b(bands[b].tobytes(), digest_size=8).hexdigest()
            )
            doc_ids.append(doc)
    return pa.table(
        {
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.string()),
            "doc_id": pa.array(doc_ids),
        }
    )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Within one LSH bucket: emit candidate pairs (ids only, a < b)."""
    n = group.num_rows
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    if n < 2:
        return empty
    ids = np.sort(np.asarray(group["doc_id"].to_pylist(), dtype=np.int64))
    a_idx, b_idx = np.triu_indices(n, k=1)
    return pa.table(
        {
            "a": pa.array(ids[a_idx], pa.int64()),
            "b": pa.array(ids[b_idx], pa.int64()),
        }
    )


def attach_pair_values(
    pairs_ds: rd.Dataset, values_ds: rd.Dataset, key_col: str, val_col: str, val_type
) -> rd.Dataset:
    """Repartition join of candidate pairs against a per-doc value table.

    ``pairs_ds`` rows are ``(a, b)``; ``values_ds`` rows are
    ``(key_col, val_col)``.  Returns ``(a, b, val_a, val_b)``.

    Distributed shape (the ~10^9-doc path — nothing touches the driver):

    1. explode each pair to two endpoint rows ``(k=a, slot=0)`` /
       ``(k=b, slot=1)`` carrying the pair identity,
    2. union with the value table tagged ``slot=-1``,
    3. ``groupby(k)`` — each group holds one value row + every endpoint
       row of that doc; stamp the value onto the endpoints,
    4. ``groupby(a, b)`` — the two stamped endpoints reunite into one
       ``(a, b, val_a, val_b)`` row.

    Both shuffle keys (doc id, pair id) are uniform by construction.
    Values of any Arrow type work (unlike Acero hash joins, which reject
    list-typed payloads).
    """

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        a, b = batch["a"], batch["b"]
        return pa.table(
            {
                "k": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "a": pa.concat_arrays([a.combine_chunks()] * 2),
                "b": pa.concat_arrays([b.combine_chunks()] * 2),
                "slot": pa.array([0] * n + [1] * n, pa.int8()),
                "val": pa.nulls(2 * n, val_type),
            }
        )

    def tag_values(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "k": batch[key_col],
                "a": pa.nulls(n, pa.int64()),
                "b": pa.nulls(n, pa.int64()),
                "slot": pa.array(np.full(n, -1, np.int8()), pa.int8()),
                "val": batch[val_col].cast(val_type),
            }
        )

    def stamp(group: pa.Table) -> pa.Table:
        slots = group["slot"].to_numpy(zero_copy_only=False)
        val_rows = np.flatnonzero(slots == -1)
        pair_rows = np.flatnonzero(slots >= 0)
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "slot": pa.array([], pa.int8()),
                "val": pa.nulls(0, val_type),
            }
        )
        if len(val_rows) == 0 or len(pair_rows) == 0:
            return empty
        val = group["val"].take(pa.array([val_rows[0]] * len(pair_rows), pa.int64()))
        sub = group.take(pa.array(pair_rows, pa.int64()))
        return pa.table(
            {"a": sub["a"], "b": sub["b"], "slot": sub["slot"], "val": val}
        )

    def reunite(group: pa.Table) -> pa.Table:
        # duplicate pair rows (the same (a,b) surfacing from several LSH
        # buckets) collapse here for free: first slot-0 + first slot-1 win,
        # so callers need no separate pair-dedup shuffle
        slots = group["slot"].to_pylist()
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "val_a": pa.nulls(0, val_type),
                "val_b": pa.nulls(0, val_type),
            }
        )
        try:
            i0, i1 = slots.index(0), slots.index(1)
        except ValueError:
            return empty  # endpoint missing from the value table
        return pa.table(
            {
                "a": group["a"].slice(0, 1),
                "b": group["b"].slice(0, 1),
                "val_a": group["val"].take(pa.array([i0], pa.int64())),
                "val_b": group["val"].take(pa.array([i1], pa.int64())),
            }
        )

    endpoints = pairs_ds.map_batches(explode, batch_format="pyarrow")
    tagged = values_ds.map_batches(tag_values, batch_format="pyarrow")
    stamped = endpoints.union(tagged).groupby("k").map_groups(
        stamp, batch_format="pyarrow"
    )
    return stamped.groupby(["a", "b"]).map_groups(reunite, batch_format="pyarrow")


def minhash_candidate_pairs(
    ds: rd.Dataset, text_col: str = "text", min_jaccard: float = 0.5
) -> pa.Table:
    """MinHash-LSH near-dup pairs: shingle → signature → band buckets →
    candidate pairs → verify by signature agreement (estimated Jaccard) ≥ τ.

    Fully distributed: bucket pairs dedup via ``groupby(a, b)`` and the
    verification joins signatures back via :func:`attach_pair_values` —
    a repartition join on doc_id, NOT a driver-side signature dict, so the
    path survives corpora whose signature table exceeds driver memory.
    """
    sig_ds = ds.map_batches(
        lambda b: minhash_sig_batch(b, text_col), batch_format="pyarrow"
    ).materialize()

    # duplicate (a, b) rows from different buckets are NOT pre-deduped:
    # the verify join's reunite step collapses them per pair key anyway,
    # saving a whole groupby exchange
    pairs_ds = (
        sig_ds.map_batches(_sigs_to_bands, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pyarrow")
    )

    sig_type = pa.list_(pa.int64())
    joined = attach_pair_values(pairs_ds, sig_ds, "doc_id", "sig", sig_type)

    def verify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        est = np.empty(n, dtype=np.float64)
        va, vb = batch["val_a"].to_pylist(), batch["val_b"].to_pylist()
        for i in range(n):
            sa, sb = np.asarray(va[i]), np.asarray(vb[i])
            est[i] = float((sa == sb).mean())
        out = pa.table(
            {
                "a": batch["a"],
                "b": batch["b"],
                "est_jaccard": pa.array(np.round(est, 6), pa.float64()),
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


def _sigs_to_bands(batch: pa.Table) -> pa.Table:
    """Explode precomputed signatures to band-key rows."""
    ids = batch["doc_id"].to_pylist()
    band_ids, band_hashes, doc_ids = [], [], []
    for doc, sig in zip(ids, batch["sig"].to_pylist()):
        bands = np.asarray(sig, dtype=np.uint64).reshape(N_BANDS, ROWS_PER_BAND)
        for b in range(N_BANDS):
            band_ids.append(b)
            band_hashes.append(
                hashlib.blake2b(bands[b].tobytes(), digest_size=8).hexdigest()
            )
            doc_ids.append(doc)
    return pa.table(
        {
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.string()),
            "doc_id": pa.array(doc_ids),
        }
    )


def connected_components_distributed(
    pairs: pa.Table | rd.Dataset,
    ids_ds: rd.Dataset,
    id_col: str = "doc_id",
    max_iters: int = 64,
) -> pa.Table:
    """Iterated min-label propagation over the dup-pair graph →
    ``(doc_id, dup_group = min id of its component)`` for EVERY id in
    ``ids_ds`` (singletons keep their own id).

    The 10^9-doc scale path: labels and edges live in Datasets throughout;
    each iteration is one ``groupby(src)`` (stamp each edge's source label)
    + one ``groupby(node).min`` (nodes adopt the smallest label heard),
    both on uniform keys.  Convergence when the label sum stops falling
    (labels only ever decrease).  LSH dup clusters are near-cliques, so
    practical iteration counts are 2-4; ``max_iters`` bounds adversarial
    chains.  The only driver traffic is the per-iteration label-sum scalar
    and the final result table.
    """
    from ray.data.aggregate import Min, Sum

    if isinstance(pairs, pa.Table):
        pairs = rd.from_arrow(pairs)

    def sym_edges(batch: pa.Table) -> pa.Table:
        a = batch["a"].combine_chunks()
        b = batch["b"].combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([a, b]),
                "dst": pa.concat_arrays([b, a]),
            }
        )

    edges = pairs.map_batches(sym_edges, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        return pa.table({"node": ids, "label": ids})

    labels = ids_ds.map_batches(init_labels, batch_format="pyarrow").materialize()
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]

    def tag_edges(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "src": batch["src"],
                "dst": batch["dst"],
                "label": pa.nulls(n, pa.int64()),
            }
        )

    def tag_labels(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "src": batch["node"],
                "dst": pa.nulls(n, pa.int64()),
                "label": batch["label"],
            }
        )

    def stamp_and_emit(group: pa.Table) -> pa.Table:
        """One src group: its current label row + its out-edges → message
        (dst, label) per edge plus (src, label) to retain the node's own."""
        lbl_col = group["label"]
        valid = pc.is_valid(lbl_col)
        idx = np.flatnonzero(valid.to_numpy(zero_copy_only=False))
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
        )
        if len(idx) == 0:
            return empty  # edge endpoints absent from ids_ds
        label = lbl_col[int(idx[0])].as_py()
        dsts = group["dst"].drop_null()
        nodes = [group["src"][0].as_py()] + dsts.to_pylist()
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "label": pa.array([label] * len(nodes), pa.int64()),
            }
        )

    for _ in range(max_iters):
        msgs = (
            edges.map_batches(tag_edges, batch_format="pyarrow")
            .union(labels.map_batches(tag_labels, batch_format="pyarrow"))
            .groupby("src")
            .map_groups(stamp_and_emit, batch_format="pyarrow")
        )
        labels = (
            msgs.groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .map_batches(
                lambda b: pa.table({"node": b["node"], "label": b["label"]}),
                batch_format="pyarrow",
            )
            .materialize()
        )
        cur_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    tbl = _collect_sorted(labels, ["node"])
    if tbl is None:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "dup_group": pa.array([], pa.int64())}
        )
    return tbl.rename_columns(["doc_id", "dup_group"])


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


def simhash64(text: str) -> int:
    """64-bit SimHash over \\w+ tokens (unit weights).

    Token hash = first 8 bytes of SHA-256, big-endian — chosen (over
    blake2b) so a DuckDB oracle can recompute the identical signature with
    ``('0x' || substr(sha256(tok), 1, 16))::UBIGINT``.
    """
    toks = _TOKEN.findall((text or "").lower())
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "big")
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    return int(
        sum(1 << i for i in range(64) if acc[i] > 0)
    )


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = [simhash64(t) for t in batch[text_col].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array([f"{v:016x}" for v in vals], pa.string()),
        }
    )


def simhash_near_dup_pairs(ds: rd.Dataset, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs with hamming(simhash) ≤ d via 4-piece pigeonhole
    bucketing (any pair within distance 3 shares at least one 16-bit piece).
    """
    sh = ds.map_batches(simhash_batch, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        ids, pieces, piece_vals, hashes = [], [], [], []
        for doc, hx in zip(batch["doc_id"].to_pylist(), batch["simhash"].to_pylist()):
            v = int(hx, 16)
            for p in range(4):
                ids.append(doc)
                pieces.append(p)
                piece_vals.append((v >> (16 * p)) & 0xFFFF)
                hashes.append(hx)
        return pa.table(
            {
                "piece": pa.array(pieces, pa.int32()),
                "piece_val": pa.array(piece_vals, pa.int32()),
                "doc_id": pa.array(ids),
                "simhash": pa.array(hashes, pa.string()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int32()),
            }
        )
        if group.num_rows < 2:
            return empty
        ids = np.asarray(group["doc_id"].to_pylist())
        vals = np.asarray([int(h, 16) for h in group["simhash"].to_pylist()], dtype=np.uint64)
        order = np.argsort(ids)
        ids, vals = ids[order], vals[order]
        a_l, b_l, d_l = [], [], []
        for i in range(len(ids)):
            x = vals[i + 1 :] ^ vals[i]
            ham = np.array([bin(int(v)).count("1") for v in x])
            for off in np.flatnonzero(ham <= max_hamming):
                a_l.append(int(ids[i]))
                b_l.append(int(ids[i + 1 + off]))
                d_l.append(int(ham[off]))
        return pa.table(
            {
                "a": pa.array(a_l, pa.int64()),
                "b": pa.array(b_l, pa.int64()),
                "hamming": pa.array(d_l, pa.int32()),
            }
        )

    out = (
        sh.map_batches(explode, batch_format="pyarrow")
        .groupby(["piece", "piece_val"])
        .map_groups(pairs, batch_format="pyarrow")
    )
    df = out.to_pandas()
    if df.empty:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int32()),
            }
        )
    df = df.groupby(["a", "b"], as_index=False)["hamming"].min().sort_values(["a", "b"])
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (exact brute force; oracle-checkable)
# ---------------------------------------------------------------------------


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
    ids = np.asarray(tbl[id_col].to_pylist(), dtype=np.int64)
    mat = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.maximum(norms, 1e-12)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    ref = ray.put((ids, mat))

    def block(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        b_ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        b_mat = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
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
    (broadcast projection matrix); vectors sharing a (table, signature)
    bucket become candidates; candidates are verified by exact cosine
    within the bucket group.  No all-pairs pass — the only shuffle is the
    groupby on bucket keys, so this survives corpora where the broadcast
    matrix of :func:`embedding_near_dup_pairs` cannot fit.

    Approximate: pairs whose vectors collide in no table are missed
    (recall rises with n_tables; p_miss = (1 - p_same_bucket)^n_tables).
    """
    import ray

    # deterministic projection planes; dim inferred from the first row
    first = ds.limit(1).to_pandas()
    dim = len(first["embedding"].iloc[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_bits, dim))
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        mat = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        out_t, out_sig, out_id, out_vec = [], [], [], []
        for t in range(pl.shape[0]):
            bits = (mat @ pl[t].T) > 0  # (n, n_bits)
            sig = bits @ (1 << np.arange(pl.shape[1], dtype=np.int64))
            out_t.extend([t] * len(ids))
            out_sig.extend(int(s) for s in sig)
            out_id.extend(int(i) for i in ids)
            out_vec.extend(mat.tolist())
        return pa.table(
            {
                "table_id": pa.array(out_t, pa.int32()),
                "sig": pa.array(out_sig, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "vec": pa.array(out_vec, pa.list_(pa.float64())),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        n = group.num_rows
        if n < 2:
            return empty
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        mat = np.asarray(group["vec"].to_pylist(), dtype=np.float64)
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        sims = mat @ mat.T
        iu, ju = np.triu_indices(n, k=1)
        hit = sims[iu, ju] >= threshold
        return pa.table(
            {
                "a": pa.array(ids[iu[hit]], pa.int64()),
                "b": pa.array(ids[ju[hit]], pa.int64()),
                "cosine": pa.array(np.round(sims[iu[hit], ju[hit]], 6), pa.float64()),
            }
        )

    df = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["table_id", "sig"])
        .map_groups(verify, batch_format="pyarrow")
        .to_pandas()
    )
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )
    if df.empty:
        return empty
    df = df.drop_duplicates(["a", "b"]).sort_values(["a", "b"])
    return pa.Table.from_pandas(df, preserve_index=False)
