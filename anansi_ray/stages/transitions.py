"""Ledger state transitions (A1/A2/A3) — vectorized numpy kernels.

Reference semantics reimplemented from scratch:

* ``db_updated_uristr`` (/root/reference/libspider/queues/db.c:944-1059) —
  TTL floors: status==200 ⇒ ttl ≥ 3600 s, otherwise ttl ≥ 86400 s;
  4xx ⇒ error_count += 1, 5xx ⇒ soft_error_count += 1, else both reset;
  ``next_fetch = now + ttl`` with a monotonic guard.
* ``db_unchanged_uristr`` (db.c:1077-1126) — 304/TTL-hit path: error ⇒
  next_fetch = now + 7 d + error_count += 1, else next_fetch = now + 2 h.
* processor TTL assignment (libspider/processor.c:213-222) — ACCEPTED ⇒
  86400 s, otherwise 604800 s.

Pure functions of equal-length arrays ⇒ usable directly inside
``map_batches`` and by the oracle.
"""

from __future__ import annotations

import numpy as np

from anansi_ray.model import CrawlConfig


def transition_batch(
    states: np.ndarray,        # persisted CRAWLSTATE names (object array)
    statuses: np.ndarray,      # int32 HTTP status (incl. synthesized 406/504)
    unchanged: np.ndarray,     # bool — A2 path taken
    clocks_ms: np.ndarray,     # int64 simulated fetch clock per row
    prev_error: np.ndarray,    # int32
    prev_soft: np.ndarray,     # int32
    prev_next_fetch_ms: np.ndarray,  # int64 (monotonic guard)
    cfg: CrawlConfig,
) -> dict[str, np.ndarray]:
    n = len(states)
    statuses = np.asarray(statuses, dtype=np.int64)
    clocks_ms = np.asarray(clocks_ms, dtype=np.int64)
    unchanged = np.asarray(unchanged, dtype=bool)
    accepted = np.asarray([s == "ACCEPTED" for s in states], dtype=bool)

    is_4xx = (statuses >= 400) & (statuses < 500)
    is_5xx = statuses >= 500
    is_err = is_4xx | is_5xx

    # A3 processor TTL then A1 floors
    ttl_s = np.where(accepted, cfg.ttl_accepted_s, cfg.ttl_not_accepted_s).astype(np.int64)
    floor = np.where(statuses == 200, cfg.ttl_ok_s, cfg.ttl_other_s)
    ttl_s = np.maximum(ttl_s, floor)

    # A2 unchanged path overrides
    ttl_s = np.where(
        unchanged & is_err, cfg.ttl_unchanged_error_s,
        np.where(unchanged, cfg.ttl_unchanged_s, ttl_s),
    )

    error_count = np.where(
        unchanged,
        np.where(is_err, prev_error + 1, prev_error),
        np.where(is_4xx, prev_error + 1, np.where(is_err, prev_error, 0)),
    ).astype(np.int32)
    soft_error_count = np.where(
        unchanged,
        prev_soft,
        np.where(is_5xx, prev_soft + 1, np.where(is_err, prev_soft, 0)),
    ).astype(np.int32)

    next_fetch_ms = clocks_ms + ttl_s * 1000
    next_fetch_ms = np.maximum(next_fetch_ms, np.asarray(prev_next_fetch_ms, np.int64))

    return {
        "next_fetch_ms": next_fetch_ms,
        "error_count": error_count,
        "soft_error_count": soft_error_count,
        "last_ttl_s": ttl_s,
        "updated_ms": clocks_ms,
    }
