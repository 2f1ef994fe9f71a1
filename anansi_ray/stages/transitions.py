"""Ledger state transitions (A1/A2/A3) — vectorized numpy kernels.

Reference semantics reimplemented from scratch and pinned to the C source
(these branch edges are verified by kernel-level unit tests in
tests/test_fetch_semantics.py, independent of the shared-kernel oracle):

* ``db_updated_uristr`` (/root/reference/libspider/queues/db.c:944-1059) —
  TTL floors: status==200 ⇒ ttl ≥ 3600 s, otherwise ttl ≥ 86400 s;
  ``next_fetch = now + ttl`` with a monotonic raise-only guard
  (db.c:1011-1016 ``WHERE next_fetch < %Q``).
  Error counters (db.c:1032-1056) — note the reference's exact ranges:
  ``status ∈ [400,499)`` ⇒ error_count += 1 (soft untouched);
  ``status ∈ [500,599)`` ⇒ error_count = 0, soft_error_count += 1;
  anything else — **including 499 and 599** — resets BOTH counters
  (a reference quirk of the ``< 499`` / ``< 599`` comparisons, mirrored
  deliberately).
* ``db_unchanged_uristr`` (db.c:1077-1126) — 304/rollback path:
  error ⇒ next_fetch = now + 7 d, error_count += 1;
  else ⇒ next_fetch = now + 2 h, error_count = 0. soft_error_count is
  untouched, the write is UNCONDITIONAL (no monotonic guard), and the
  ledger ``state``/``status`` columns are not updated.
  In the integrated crawld the error flag is ALWAYS 0
  (libspider/processor.c:240 hardcodes ``queue_unchanged_uristr(..., 0)``),
  so ``unchanged_error`` defaults to all-False; the parameter exists
  because the queue API exposes it (libspider.h:131-147).
* processor TTL assignment (libspider/processor.c:213-222) — ACCEPTED ⇒
  86400 s, otherwise 604800 s; the *failed-callback* path passes 86400 s
  (processor.c:261) — callers provide the per-row base via ``ttl_base_s``.

Pure functions of equal-length arrays ⇒ usable directly inside
``map_batches`` and by the oracle.
"""

from __future__ import annotations

import numpy as np

from anansi_ray.model import CrawlConfig


def transition_batch(
    ttl_base_s: np.ndarray,    # int64 processor-assigned TTL (A3 / failed cb)
    statuses: np.ndarray,      # int32 wire HTTP status (incl. synthesized 406/504)
    unchanged: np.ndarray,     # bool — A2 path taken (304 / rollback-to-cache)
    clocks_ms: np.ndarray,     # int64 simulated fetch clock per row
    prev_error: np.ndarray,    # int32
    prev_soft: np.ndarray,     # int32
    prev_next_fetch_ms: np.ndarray,  # int64 (monotonic guard, fresh path only)
    cfg: CrawlConfig,
    unchanged_error: np.ndarray | None = None,  # db_unchanged error flag
) -> dict[str, np.ndarray]:
    n = len(statuses)
    statuses = np.asarray(statuses, dtype=np.int64)
    clocks_ms = np.asarray(clocks_ms, dtype=np.int64)
    unchanged = np.asarray(unchanged, dtype=bool)
    ttl_base_s = np.asarray(ttl_base_s, dtype=np.int64)
    prev_error = np.asarray(prev_error, dtype=np.int64)
    prev_soft = np.asarray(prev_soft, dtype=np.int64)
    if unchanged_error is None:
        unchanged_error = np.zeros(n, dtype=bool)  # processor.c:240
    else:
        unchanged_error = np.asarray(unchanged_error, dtype=bool)
    u_err = unchanged & unchanged_error
    u_ok = unchanged & ~unchanged_error

    # reference ranges exactly (db.c:1032-1056): 499/599 fall in NEITHER
    is_4xx = (statuses >= 400) & (statuses < 499)
    is_5xx = (statuses >= 500) & (statuses < 599)

    # A1 floors over the A3 base (db.c:962-976)
    floor = np.where(statuses == 200, cfg.ttl_ok_s, cfg.ttl_other_s)
    ttl_s = np.maximum(ttl_base_s, floor)

    # A2 unchanged path overrides (db.c:1101-1121, no floors)
    ttl_s = np.where(
        u_err, cfg.ttl_unchanged_error_s, np.where(u_ok, cfg.ttl_unchanged_s, ttl_s)
    )

    error_count = np.where(
        unchanged,
        np.where(u_err, prev_error + 1, 0),
        np.where(is_4xx, prev_error + 1, 0),  # 5xx and success both reset
    ).astype(np.int32)
    soft_error_count = np.where(
        unchanged,
        prev_soft,
        np.where(is_5xx, prev_soft + 1, np.where(is_4xx, prev_soft, 0)),
    ).astype(np.int32)

    next_fetch_ms = clocks_ms + ttl_s * 1000
    # monotonic raise-only guard applies to the fresh path only
    # (db.c:1011-1016 vs the unconditional db.c:1113-1121 update)
    guarded = np.maximum(next_fetch_ms, np.asarray(prev_next_fetch_ms, np.int64))
    next_fetch_ms = np.where(unchanged, next_fetch_ms, guarded)

    return {
        "next_fetch_ms": next_fetch_ms,
        "error_count": error_count,
        "soft_error_count": soft_error_count,
        "last_ttl_s": ttl_s,
        "updated_ms": clocks_ms,
    }
