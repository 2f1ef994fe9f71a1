"""Single-threaded reference-semantics crawler (the conformance oracle).

A pure-Python, dict-based reimplementation of the reference's dequeue loop
(/root/reference/libspider/queues/db.c:611-791) under **discrete-round
micro-batch semantics** (SURVEY.md §2.12): the Ray pipeline must reproduce
this crawl order, final URL-seen set and per-document span sequences exactly.

Semantics:

* eligibility: state ∈ {NEW, FORCE} and host rate > 0 (db.c:687 requires
  ``rate > 0``).
* new rows are inserted with ``next_fetch = discovery time`` (mirroring the
  reference's insert-with-NOW, db.c:906-926); all timestamps are simulated
  — computed, never slept.
* per round, per host: rows ordered by the O1 key (state='NEW' first, then
  next_fetch, then url_hash as the pinned tie-break — db.c:691 plus SURVEY
  §7.4), up to ``budget`` rows, fetch slots chained causally:
  ``t_j = max(t_{j-1} + rate_ms, next_fetch_j)`` — at least ``rate`` between
  same-host fetches and never before discovery (politeness enforced inside
  the dequeue step, db.c:762-790; the round model makes the issue-#41 race
  structurally impossible).
* fetch/process/transition: the exact same pure kernels as the pipeline
  (stages.fetch.process_fetch, stages.transitions.transition_batch).
* links discovered in round r are merged into the frontier at end of round
  (candidates deduped by url_hash keeping the MINIMUM depth — the same
  deterministic rule the distributed pipeline's groupby merge applies, so
  depth values cannot depend on task interleaving); they become eligible in
  round r+1.
* global crawl order = sort of all fetch records by
  (fetch_clock_ms, url_hash).

This module deliberately shares *per-record* kernels with the pipeline but
none of the scheduling / dedup / merge machinery — those are what the
conformance tests verify.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from anansi_ray.canon import canonicalize, cache_key, root_of
from anansi_ray.model import CrawlConfig, SPAN_TYPE, state_name
from anansi_ray.stages.fetch import _webrow_dicts, process_fetch
from anansi_ray.stages.transitions import transition_batch


def reference_crawl(
    tables: dict[str, pa.Table],
    cfg: CrawlConfig | None = None,
    budget: int | None = None,
    max_rounds: int | None = None,
) -> dict:
    """Crawl the fixture tables; returns ``expected_crawl``, ``ledger`` and
    ``documents`` Arrow tables plus round count.
    """
    cfg = cfg or CrawlConfig()
    budget = budget if budget is not None else cfg.per_host_budget or None
    max_rounds = max_rounds or cfg.max_rounds

    web = _webrow_dicts(tables["web"])
    hosts: dict[str, dict] = {}
    for row in tables["hosts"].to_pylist():
        hosts[row["host"]] = {
            "rate_ms": row["rate_ms"],
            "robots": row.get("robots_disallow") or [],
            "eu": 0,
        }

    ledger: dict[str, dict] = {}  # url_hash -> row

    def ensure_host(host: str) -> dict:
        h = hosts.get(host)
        if h is None:
            h = {"rate_ms": cfg.default_rate_ms, "robots": [], "eu": 0}
            hosts[host] = h
        return h

    # url_hash -> [url, next_fetch_ms, depth, score]; merge keeps min
    # (nf, depth) and SUMS the link score (in-degree)
    pending: dict[str, list] = {}

    def enqueue(raw_url: str, base: str | None, depth: int, discovered_ms: int):
        """Collect a round's candidate; merged into the ledger at round end
        keeping the earliest (next_fetch_ms, depth) per hash — the same
        deterministic rule the pipeline's groupby merge applies.  New rows
        carry next_fetch = discovery time, mirroring the reference's
        insert-with-NOW (db.c:906-926)."""
        c = canonicalize(raw_url, base)
        if c is None or "://" not in c or depth > cfg.max_depth:
            return
        h = cache_key(c)
        prev = pending.get(h)
        if prev is None:
            pending[h] = [c, discovered_ms, depth, 1.0]
        else:
            prev[3] += 1.0
            if (discovered_ms, depth) < (prev[1], prev[2]):
                prev[0], prev[1], prev[2] = c, discovered_ms, depth

    def insert_new(
        h: str,
        c: str,
        depth: int,
        rnd: int,
        nf_ms: int,
        force: bool = False,
        priority: float = 0.0,
    ):
        row = ledger.get(h)
        if row is not None:
            if force:
                row["state"] = "FORCE"
            return
        _, rh, host = root_of(c)
        ensure_host(host)
        ledger[h] = {
            "url": c,
            "url_hash": h,
            "host": host,
            "root_hash": rh,
            "depth": depth,
            "priority": priority,
            "state": "FORCE" if force else "NEW",
            "status": 0,
            "next_fetch_ms": nf_ms,
            "error_count": 0,
            "soft_error_count": 0,
            "last_ttl_s": 0,
            "added_round": rnd,
            "updated_ms": 0,
        }

    def merge_pending(rnd: int):
        for h, (c, nf, depth, score) in pending.items():
            insert_new(h, c, depth, rnd, nf, priority=score)
        pending.clear()

    for s in tables["seeds"].to_pylist():
        c = canonicalize(s["url"])
        if c is None or "://" not in c:
            continue
        insert_new(cache_key(c), c, 0, 0, 0, force=bool(s["force"]))

    records: list[tuple] = []
    documents: list[tuple] = []
    rounds = 0

    for rnd in range(max_rounds):
        # every eligible row of every politeness-enabled host is scheduled
        # each round; causality comes from per-row next_fetch (discovery
        # time) folded into the chained slot times below
        horizon = cfg.refetch_horizon_ms
        due_by_host: dict[str, list[dict]] = {}
        for r in ledger.values():
            if hosts[r["host"]]["rate_ms"] <= 0:
                continue
            if r["state"] in ("NEW", "FORCE") or (
                horizon is not None and r["next_fetch_ms"] <= horizon
            ):
                due_by_host.setdefault(r["host"], []).append(r)
        if not due_by_host:
            break
        rounds += 1

        scheduled: list[tuple[dict, int]] = []
        for host in due_by_host:
            if cfg.use_priority:
                # engine-extension priority order: NEW first, link score
                # desc, depth asc, then the O1 tail
                rows = sorted(
                    due_by_host[host],
                    key=lambda r: (
                        r["state"] != "NEW",
                        -r["priority"],
                        r["depth"],
                        r["next_fetch_ms"],
                        r["url_hash"],
                    ),
                )
            else:
                rows = sorted(
                    due_by_host[host],
                    key=lambda r: (r["state"] != "NEW", r["next_fetch_ms"], r["url_hash"]),
                )
            if budget:
                rows = rows[:budget]
            hstate = hosts[host]
            # chained politeness slots: t_j = max(t_{j-1} + rate,
            # row.next_fetch) — ≥rate between same-host fetches AND never
            # before the row was discovered (db.c:762-790 politeness +
            # next_fetch time gate db.c:689)
            t = hstate["eu"]
            rate = hstate["rate_ms"]
            for r in rows:
                t = max(t, r["next_fetch_ms"])
                scheduled.append((r, t))
                t += rate
            hstate["eu"] = t

        for row, t in scheduled:
            prev_upd = row["updated_ms"] if row["state"] not in ("NEW", "FORCE") else None
            rec = process_fetch(
                row["url"], web.get(row["url"]), hosts[row["host"]]["robots"], cfg, prev_upd
            )
            # A2 unchanged leaves the persisted state AND status untouched
            # (db_unchanged_uristr, db.c:1077-1126)
            pstate = row["state"] if rec["unchanged"] else state_name(rec["state"])
            pstatus = row["status"] if rec["unchanged"] else rec["status"]
            tr = transition_batch(
                np.array([rec["ttl_base_s"]], dtype=np.int64),
                np.array([rec["status"]]),
                np.array([rec["unchanged"]]),
                np.array([t], dtype=np.int64),
                np.array([row["error_count"]]),
                np.array([row["soft_error_count"]]),
                np.array([row["next_fetch_ms"]], dtype=np.int64),
                cfg,
            )
            row.update(
                state=pstate,
                status=pstatus,
                next_fetch_ms=int(tr["next_fetch_ms"][0]),
                error_count=int(tr["error_count"][0]),
                soft_error_count=int(tr["soft_error_count"][0]),
                last_ttl_s=int(tr["last_ttl_s"][0]),
                updated_ms=t,
            )
            records.append((t, row["url_hash"], row["url"], pstate, rec["status"]))
            if rec["accepted"]:
                documents.append((row["url_hash"], rec["spans"]))
            if rec["redirect"]:
                enqueue(rec["redirect"], None, row["depth"] + 1, t)
            for link in rec["out_links"]:
                enqueue(link, row["url"], row["depth"] + 1, t)
        merge_pending(rnd + 1)

    records.sort(key=lambda r: (r[0], r[1]))
    expected = pa.table(
        {
            "seq": pa.array(range(len(records)), pa.int64()),
            "fetch_clock_ms": pa.array([r[0] for r in records], pa.int64()),
            "url_hash": pa.array([r[1] for r in records], pa.string()),
            "url": pa.array([r[2] for r in records], pa.string()),
            "state": pa.array([r[3] for r in records], pa.string()),
            "status": pa.array([r[4] for r in records], pa.int32()),
        }
    )
    ledger_tbl = pa.table(
        {
            k: [r[k] for r in ledger.values()]
            for k in (
                "url",
                "url_hash",
                "host",
                "root_hash",
                "depth",
                "priority",
                "state",
                "status",
                "next_fetch_ms",
                "error_count",
                "soft_error_count",
                "last_ttl_s",
                "added_round",
                "updated_ms",
            )
        }
    )
    docs_tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in documents], pa.string()),
            "spans": pa.array([d[1] for d in documents], pa.list_(SPAN_TYPE)),
        }
    )
    return {
        "expected_crawl": expected,
        "ledger": ledger_tbl,
        "documents": docs_tbl,
        "rounds": rounds,
    }
