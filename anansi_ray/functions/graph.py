"""Distributed iterative graph processing: integer-exact PageRank.

The iterative-superstep shape the reference engine has no counterpart for,
but which a 100-TB link corpus (the crawl's own output) needs: per
iteration the RANK table is exchanged — O(N) rows — while the edge list is
partitioned ONCE by source and never moves again; contributions are
pre-summed per destination inside each partition kernel before the second
O(N)-row exchange.  Nothing edge-sized ever crosses the wire after the
initial layout, so a 10^10-edge graph costs two node-sized exchanges per
superstep.

All arithmetic is integer floor division (rank fixed-point at 1e9, damping
0.85 as (85·x)//100), making the result bit-equal to the unrolled SQL twin
regardless of summation order — the same determinism contract as
functions/clustering.py's k-means.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

R0 = 1_000_000_000  # initial rank, fixed-point 1e9
BASE = 150_000_000  # (1 - d) * 1e9 with damping d = 0.85


# ---------------------------------------------------------------------------
# Partition-once / iterate-in-place plumbing.  Static per-iteration state
# (edge lists, baseline node rows) is grouped by its ``part`` column ONE
# time; afterwards the supersteps look a part's blocks up by ObjectRef
# inside the group kernel — zero-copy from the object store, never
# re-shuffled, never driver-resident.  Only the iteration-variant rows
# (ranks, contributions, frontiers) cross the wire each superstep.

from anansi_ray.arrowds import fetch_part as _fetch_part
from anansi_ray.arrowds import group_once as _group_once
from anansi_ray.arrowds import refs_by_part as _refs_by_part


def _skeleton(n_parts: int) -> pa.Table:
    """One sentinel row per partition so every part's group EXISTS in an
    exchange even when no live rows landed there (sentinels are dropped
    inside the kernel; the static side is then merged from refs)."""
    return pa.table(
        {
            "part": pa.array(np.arange(n_parts, dtype=np.int32), pa.int32()),
            "out": pa.array(np.full(n_parts, -1, np.int64), pa.int64()),
            "c": pa.array(np.zeros(n_parts, np.int64), pa.int64()),
        }
    )


def _edges_from_docs(docs: rd.Dataset, n_docs: int, n_parts: int) -> rd.Dataset:
    """Deterministic synthetic link graph over doc_id: each document links
    to (2i+1) % N and (3i+7) % N (parallel edges kept; out-degree is
    always 2).  Partitioned by ``src % P`` — the layout every superstep
    reuses."""

    def gen(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([i, i])
        dst = np.concatenate([(2 * i + 1) % n_docs, (3 * i + 7) % n_docs])
        return pa.table(
            {
                "part": pa.array((src % n_parts).astype(np.int32), pa.int32()),
                "key": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    return docs.map_batches(gen, batch_format="pyarrow").materialize()


def _latest_pr_checkpoint(checkpoint_dir: str):
    """Most recent COMMITTED superstep checkpoint ``(iter, path)`` or
    ``None``.  Only directories that finished the atomic tmp→rename commit
    count; stragglers from a killed writer (``*.tmp-*``) are ignored, the
    same contract as the crawl ledger's checkpoints."""
    import os

    if not os.path.isdir(checkpoint_dir):
        return None
    best = None
    for name in os.listdir(checkpoint_dir):
        if not name.startswith("iter_") or ".tmp-" in name:
            continue
        path = os.path.join(checkpoint_dir, name)
        if not os.path.isfile(os.path.join(path, "manifest.json")):
            continue  # never finished committing
        it = int(name.split("_", 1)[1])
        if best is None or it > best[0]:
            best = (it, path)
    return best


def _commit_pr_checkpoint(
    checkpoint_dir: str, it: int, ranks: rd.Dataset, meta: dict
) -> None:
    """Spool the superstep's rank table + manifest to a tmp dir, then
    atomically rename into place (≙ the crawl ledger's tmpfile+rename,
    disk.c:144-170); the previous superstep's checkpoint is dropped after
    the new one commits, so disk use stays one node-table."""
    import json
    import os
    import shutil

    os.makedirs(checkpoint_dir, exist_ok=True)
    final = os.path.join(checkpoint_dir, f"iter_{it:04d}")
    tmp = f"{final}.tmp-{os.getpid()}"
    ranks.write_parquet(tmp)
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump({"iter": it, **meta}, f)
    os.rename(tmp, final)
    prev = os.path.join(checkpoint_dir, f"iter_{it - 1:04d}")
    if it > 0 and os.path.isdir(prev):
        shutil.rmtree(prev, ignore_errors=True)


def pagerank_integer(
    docs: rd.Dataset,
    n_docs: int,
    iters: int = 3,
    n_parts: int = 32,
    checkpoint_dir: "str | None" = None,
    resume: bool = False,
    stop_after: "int | None" = None,
) -> "pa.Table | None":
    """``iters`` supersteps of integer PageRank; returns (doc_id, pr)
    sorted by doc_id.  ``docs`` needs only a ``doc_id`` column.

    With ``checkpoint_dir`` each completed superstep commits its rank
    table atomically (tmp+rename + manifest); ``resume=True`` restarts
    from the latest committed superstep instead of iteration 0 — the
    10^10-edge case where losing 50 supersteps to a preemption is not
    acceptable.  The static edge layout is rebuilt on resume (cheap, one
    pass over ``docs``); only the iteration-variant rank state is
    persisted.  ``stop_after=k`` simulates a kill after k supersteps
    (returns ``None``) — the resume conformance test's hook."""
    from anansi_ray.arrowds import drop_empty_blocks

    # static state laid out ONCE: edge blocks + all-node baseline blocks,
    # looked up by ObjectRef inside the superstep kernels ever after
    edge_refs = _refs_by_part(_group_once(_edges_from_docs(docs, n_docs, n_parts)))

    def base_rows(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((i % n_parts).astype(np.int32), pa.int32()),
                "out": pa.array(i, pa.int64()),
                "c": pa.array(np.zeros(len(i), np.int64), pa.int64()),
            }
        )

    baseline_refs = _refs_by_part(
        _group_once(docs.map_batches(base_rows, batch_format="pyarrow"))
    )
    skeleton = rd.from_arrow(_skeleton(n_parts))

    def init_ranks(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(i, pa.int64()),
                "pr": pa.array(np.full(len(i), R0, np.int64), pa.int64()),
            }
        )

    ranks = docs.map_batches(init_ranks, batch_format="pyarrow").materialize()

    def tag_ranks(b: pa.Table) -> pa.Table:
        k = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((k % n_parts).astype(np.int32), pa.int32()),
                "key": b["doc_id"],
                "pr": b["pr"],
            }
        )

    empty = pa.table(
        {"out": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
    )

    def contrib_part(g: pa.Table) -> pa.Table:
        # g holds ONLY this part's rank rows; edges come from the static
        # layout by ref (object-store read, no exchange)
        if g.num_rows == 0:
            return empty
        p = int(g["part"][0].as_py())
        et = _fetch_part(edge_refs, p)
        if et is None:
            return empty
        rk = g["key"].to_numpy(zero_copy_only=False)
        rv = g["pr"].to_numpy(zero_copy_only=False)
        order = np.argsort(rk)
        rk, rv = rk[order], rv[order]
        src = et["key"].to_numpy(zero_copy_only=False)
        dst = et["dst"].to_numpy(zero_copy_only=False)
        pr_src = rv[np.searchsorted(rk, src)]
        # out-degree is 2 by construction; damping 0.85 in exact integers
        contrib = (85 * (pr_src // 2)) // 100
        uniq, inv = np.unique(dst, return_inverse=True)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, contrib)
        return pa.table(
            {"out": pa.array(uniq, pa.int64()), "c": pa.array(s, pa.int64())}
        )

    def tag_out(b: pa.Table) -> pa.Table:
        d = b["out"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((d % n_parts).astype(np.int32), pa.int32()),
                "out": b["out"],
                "c": b["c"],
            }
        )

    rank_empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "pr": pa.array([], pa.int64())}
    )

    def sum_part(g: pa.Table) -> pa.Table:
        # coarse-part combine: every contribution for a dst lands in this
        # part, so the per-dst total is exact in-kernel (integer sums are
        # summation-order-free).  The skeleton row guarantees this group
        # exists; the all-node baseline comes from the static layout.
        if g.num_rows == 0:
            return rank_empty
        p = int(g["part"][0].as_py())
        d = g["out"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        live = d >= 0  # drop the skeleton sentinel
        bt = _fetch_part(baseline_refs, p)
        if bt is None:
            d, c = d[live], c[live]
            if len(d) == 0:
                return rank_empty
        else:
            nodes = bt["out"].to_numpy(zero_copy_only=False)
            d = np.concatenate([nodes, d[live]])
            c = np.concatenate([np.zeros(len(nodes), np.int64), c[live]])
        uniq, inv = np.unique(d, return_inverse=True)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, c)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "pr": pa.array(BASE + s, pa.int64()),
            }
        )

    start_iter = 0
    if checkpoint_dir is not None and resume:
        latest = _latest_pr_checkpoint(checkpoint_dir)
        if latest is not None:
            it, path = latest
            ranks = rd.read_parquet(
                path, columns=["doc_id", "pr"], file_extensions=["parquet"]
            ).materialize()
            start_iter = it + 1

    for i in range(start_iter, iters):
        tagged = ranks.map_batches(tag_ranks, batch_format="pyarrow")
        contrib = drop_empty_blocks(
            tagged.groupby("part")
            .map_groups(contrib_part, batch_format="pyarrow")
            .materialize()
        )
        ranks = drop_empty_blocks(
            contrib.map_batches(tag_out, batch_format="pyarrow")
            .union(skeleton)
            .groupby("part")
            .map_groups(sum_part, batch_format="pyarrow")
            .materialize()
        )
        if checkpoint_dir is not None:
            _commit_pr_checkpoint(
                checkpoint_dir,
                i,
                ranks,
                {"n_docs": n_docs, "iters": iters, "n_parts": n_parts},
            )
        if stop_after is not None and i + 1 >= stop_after and i + 1 < iters:
            return None  # simulated kill between supersteps

    from anansi_ray.arrowds import stable_frame

    out = stable_frame(
        ranks.to_pandas(), {"doc_id": "int64", "pr": "int64"}
    ).sort_values("doc_id")
    out["pr"] = out["pr"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def khop_reach(
    docs: rd.Dataset, n_docs: int, hops: int = 3, mod: int = 53, n_parts: int = 32
) -> pa.Table:
    """K-hop BFS reachability over the synthetic link graph: for every root
    (doc_id % mod == 0) the count of DISTINCT nodes reachable within
    ``hops`` edges (the root itself included).  Returns (root, n_reach)
    sorted by root.

    Distributed frontier expansion: the edge list is laid out ONCE by
    ``src % P`` and never moves again; each hop exchanges only the live
    frontier (root, node) pairs — bounded by Σ_r out-degree^hop, NOT the
    edge count — joins them block-locally against the co-partitioned edges
    (searchsorted range expansion, no per-row Python), then anti-joins the
    expansion against the visited set on a composite pair key so a node is
    expanded at most once per root.  This is the textbook BSP/Pregel BFS
    superstep expressed as Dataset exchanges; at a 10^10-node corpus the
    pair key becomes (root_hash, node) and ``mod`` bounds the root set."""
    from anansi_ray.arrowds import drop_empty_blocks

    edge_refs = _refs_by_part(_group_once(_edges_from_docs(docs, n_docs, n_parts)))

    def roots_init(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = i[i % mod == 0]
        return pa.table(
            {"root": pa.array(r, pa.int64()), "node": pa.array(r, pa.int64())}
        )

    visited = docs.map_batches(roots_init, batch_format="pyarrow").materialize()
    frontier = visited

    def tag_frontier(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((node % n_parts).astype(np.int32), pa.int32()),
                "key": pa.array(node, pa.int64()),
                "root": b["root"],
            }
        )

    pair_empty = pa.table(
        {"root": pa.array([], pa.int64()), "node": pa.array([], pa.int64())}
    )

    def expand_part(g: pa.Table) -> pa.Table:
        # g holds ONLY this part's frontier rows; edges come from the
        # static layout by ref (object-store read, no exchange)
        if g.num_rows == 0:
            return pair_empty
        p = int(g["part"][0].as_py())
        et = _fetch_part(edge_refs, p)
        if et is None:
            return pair_empty
        src = et["key"].to_numpy(zero_copy_only=False)
        dst = et["dst"].to_numpy(zero_copy_only=False)
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        fnode = g["key"].to_numpy(zero_copy_only=False)
        froot = g["root"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(src, fnode, side="left")
        hi = np.searchsorted(src, fnode, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return pair_empty
        roots_rep = np.repeat(froot, cnt)
        # concatenated [lo_i, hi_i) ranges without a Python loop
        offs = np.cumsum(cnt) - cnt
        idx = np.arange(total, dtype=np.int64) - np.repeat(offs, cnt) + np.repeat(lo, cnt)
        return pa.table(
            {
                "root": pa.array(roots_rep, pa.int64()),
                "node": pa.array(dst[idx], pa.int64()),
            }
        )

    def tag_pairs(b: pa.Table) -> pa.Table:
        root = b["root"].to_numpy(zero_copy_only=False)
        node = b["node"].to_numpy(zero_copy_only=False)
        pk = root * np.int64(n_docs) + node
        return pa.table(
            {
                "part": pa.array((pk % n_parts).astype(np.int32), pa.int32()),
                "pk": pa.array(pk, pa.int64()),
                "root": b["root"],
                "node": b["node"],
            }
        )

    # the visited set never crosses the wire: it accumulates as per-part
    # block refs (each hop's fresh output is ALREADY pk-partitioned, so
    # its refs just append to the part's list), and the anti-join kernel
    # reads its part's history from the object store
    visited_refs: dict = {}

    def _append_refs(grouped: rd.Dataset) -> None:
        for p, rs in _refs_by_part(grouped).items():
            visited_refs.setdefault(p, []).extend(rs)

    _append_refs(
        _group_once(visited.map_batches(tag_pairs, batch_format="pyarrow"))
    )

    def fresh_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pair_empty_p
        p = int(g["part"][0].as_py())
        cand = np.unique(g["pk"].to_numpy(zero_copy_only=False))
        vt = _fetch_part(visited_refs, p)
        if vt is not None:
            seen = np.unique(vt["pk"].to_numpy(zero_copy_only=False))
            cand = cand[~np.isin(cand, seen, assume_unique=True)]
        return pa.table(
            {
                "part": pa.array(
                    np.full(len(cand), p, np.int32), pa.int32()
                ),
                "pk": pa.array(cand, pa.int64()),
                "root": pa.array(cand // n_docs, pa.int64()),
                "node": pa.array(cand % n_docs, pa.int64()),
            }
        )

    pair_empty_p = pa.table(
        {
            "part": pa.array([], pa.int32()),
            "pk": pa.array([], pa.int64()),
            "root": pa.array([], pa.int64()),
            "node": pa.array([], pa.int64()),
        }
    )

    for _ in range(hops):
        tagged = frontier.map_batches(tag_frontier, batch_format="pyarrow")
        new_pairs = drop_empty_blocks(
            tagged.groupby("part")
            .map_groups(expand_part, batch_format="pyarrow")
            .materialize()
        )
        fresh = drop_empty_blocks(
            new_pairs.map_batches(tag_pairs, batch_format="pyarrow")
            .groupby("part")
            .map_groups(fresh_part, batch_format="pyarrow")
            .materialize()
        )
        if fresh.count() == 0:
            break
        _append_refs(fresh)
        frontier = fresh.select_columns(["root", "node"]).materialize()
        visited = visited.union(frontier).materialize()

    from anansi_ray.arrowds import stable_frame

    out = (
        stable_frame(visited.to_pandas(), {"root": "int64", "node": "int64"})
        .groupby("root")
        .size()
        .reset_index(name="n_reach")
    )
    out["n_reach"] = out["n_reach"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("root").reset_index(drop=True), preserve_index=False
    )


def hits_integer(
    docs: rd.Dataset, n_docs: int, rounds: int = 2, n_parts: int = 32
) -> pa.Table:
    """Integer-exact HITS (Kleinberg 1999) over the same deterministic
    link graph as :func:`pagerank_integer`: alternating
    authority = Σ hubs of in-neighbours / hub = Σ authorities of
    out-neighbours supersteps.  Degrees are tiny constants, so ``rounds``
    alternations from h₀ = 1 stay in small exact integers — no float
    normalization, which is what makes a PURE SQL twin possible (the
    classic L2-normalized HITS would need an artifact twin).

    Each superstep is the pagerank shape: one value exchange keyed by the
    lookup side, per-partition vectorized searchsorted + integer bincount,
    one exchange of (node, partial) rows — integer sums are summation-
    order-free, so the result is bit-equal whatever the block layout.
    """
    from anansi_ray.arrowds import drop_empty_blocks, stable_frame

    def gen_dir(lookup_is_src: bool):
        def gen(b: pa.Table) -> pa.Table:
            i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            src = np.concatenate([i, i])
            dst = np.concatenate([(2 * i + 1) % n_docs, (3 * i + 7) % n_docs])
            key = src if lookup_is_src else dst
            out = dst if lookup_is_src else src
            return pa.table(
                {
                    "part": pa.array((key % n_parts).astype(np.int32), pa.int32()),
                    "key": pa.array(key, pa.int64()),
                    "out": pa.array(out, pa.int64()),
                }
            )

        return _refs_by_part(
            _group_once(docs.map_batches(gen, batch_format="pyarrow"))
        )

    edges_by_src = gen_dir(True)   # authority update reads hub(src)
    edges_by_dst = gen_dir(False)  # hub update reads authority(dst)

    def base_rows(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((i % n_parts).astype(np.int32), pa.int32()),
                "out": pa.array(i, pa.int64()),
                "c": pa.array(np.zeros(len(i), np.int64), pa.int64()),
            }
        )

    baseline_refs = _refs_by_part(
        _group_once(docs.map_batches(base_rows, batch_format="pyarrow"))
    )
    skeleton = rd.from_arrow(_skeleton(n_parts))

    def init_vals(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(i, pa.int64()),
                "val": pa.array(np.ones(len(i), np.int64), pa.int64()),
            }
        )

    hubs = docs.map_batches(init_vals, batch_format="pyarrow").materialize()

    def tag_vals(b: pa.Table) -> pa.Table:
        k = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((k % n_parts).astype(np.int32), pa.int32()),
                "key": b["doc_id"],
                "val": b["val"],
            }
        )

    contrib_empty = pa.table(
        {"out": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
    )

    def make_contrib_part(edge_refs: dict):
        def contrib_part(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return contrib_empty
            p = int(g["part"][0].as_py())
            et = _fetch_part(edge_refs, p)
            if et is None:
                return contrib_empty
            rk = g["key"].to_numpy(zero_copy_only=False)
            rv = g["val"].to_numpy(zero_copy_only=False)
            order = np.argsort(rk)
            rk, rv = rk[order], rv[order]
            lookup = et["key"].to_numpy(zero_copy_only=False)
            out = et["out"].to_numpy(zero_copy_only=False)
            vals = rv[np.searchsorted(rk, lookup)]
            uniq, inv = np.unique(out, return_inverse=True)
            s = np.zeros(len(uniq), np.int64)
            np.add.at(s, inv, vals)
            return pa.table(
                {"out": pa.array(uniq, pa.int64()), "c": pa.array(s, pa.int64())}
            )

        return contrib_part

    def tag_out(b: pa.Table) -> pa.Table:
        d = b["out"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((d % n_parts).astype(np.int32), pa.int32()),
                "out": b["out"],
                "c": b["c"],
            }
        )

    val_empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "val": pa.array([], pa.int64())}
    )

    def sum_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return val_empty
        p = int(g["part"][0].as_py())
        d = g["out"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        live = d >= 0  # drop the skeleton sentinel
        bt = _fetch_part(baseline_refs, p)
        if bt is None:
            d, c = d[live], c[live]
            if len(d) == 0:
                return val_empty
        else:
            nodes = bt["out"].to_numpy(zero_copy_only=False)
            d = np.concatenate([nodes, d[live]])
            c = np.concatenate([np.zeros(len(nodes), np.int64), c[live]])
        uniq, inv = np.unique(d, return_inverse=True)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, c)
        return pa.table(
            {"doc_id": pa.array(uniq, pa.int64()), "val": pa.array(s, pa.int64())}
        )

    def step(edge_refs: dict, vals: rd.Dataset) -> rd.Dataset:
        tagged = vals.map_batches(tag_vals, batch_format="pyarrow")
        contrib = drop_empty_blocks(
            tagged.groupby("part")
            .map_groups(make_contrib_part(edge_refs), batch_format="pyarrow")
            .materialize()
        )
        return drop_empty_blocks(
            contrib.map_batches(tag_out, batch_format="pyarrow")
            .union(skeleton)
            .groupby("part")
            .map_groups(sum_part, batch_format="pyarrow")
            .materialize()
        )

    auth = None
    for _ in range(rounds):
        auth = step(edges_by_src, hubs)   # a ← Σ h over in-edges
        hubs = step(edges_by_dst, auth)   # h ← Σ a over out-edges

    a_df = stable_frame(
        auth.to_pandas(), {"doc_id": "int64", "val": "int64"}
    ).rename(columns={"val": "authority"})
    h_df = stable_frame(
        hubs.to_pandas(), {"doc_id": "int64", "val": "int64"}
    ).rename(columns={"val": "hub"})
    out = a_df.merge(h_df, on="doc_id").sort_values("doc_id", ignore_index=True)
    out = out[["doc_id", "hub", "authority"]]
    out["hub"] = out["hub"].astype("int64")
    out["authority"] = out["authority"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)
