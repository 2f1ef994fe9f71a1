"""Downstream handoff: the MQ plugin equivalent (S9/S10).

The reference exposes ACCEPTED resources to consumers through a message
queue: dequeue one per node (``tinyhash % nodecount = nodeid``, ``ORDER BY
updated DESC``), yield ``anansi:///<hash>``, then ack ⇒ COMPLETE / nack ⇒
FAILED guarded on ``state='ACCEPTED'`` (/root/reference/mq/mq.c:271-339,
441-468).

In a table-native engine no queue is needed (SURVEY §2.1 S9): consumers read
the ledger filtered on ``state == 'ACCEPTED'``; ack/nack are pure state
transitions producing the next ledger snapshot.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def accepted_export(
    ledger: pa.Table, node_id: int = 0, node_count: int = 1
) -> pa.Table:
    """The S9 consumer view: this node's ACCEPTED resources, most recently
    updated first (O3 ordering, mq.c:299-300), with the ``anansi:///<hash>``
    resource URIs the MQ would emit."""
    t = ledger.filter(pc.equal(ledger["state"], "ACCEPTED"))
    if node_count > 1:
        tiny = [int(h[:8], 16) % 256 for h in t["url_hash"].to_pylist()]
        mask = pa.array([x % node_count == node_id for x in tiny], pa.bool_())
        t = t.filter(mask)
    order = pc.sort_indices(
        t, sort_keys=[("updated_ms", "descending"), ("url_hash", "ascending")]
    )
    t = t.take(order)
    uris = pa.array([f"anansi:///{h}" for h in t["url_hash"].to_pylist()], pa.string())
    return pa.table(
        {
            "mq_uri": uris,
            "url_hash": t["url_hash"],
            "url": t["url"],
            "updated_ms": t["updated_ms"],
        }
    )


def _transition_guarded(ledger: pa.Table, url_hashes, new_state: str) -> pa.Table:
    """ACCEPTED-guarded state transition (mq.c:441-468 ``WHERE
    state='ACCEPTED'``): rows in ``url_hashes`` currently ACCEPTED move to
    ``new_state``; everything else is untouched.  Pure function → new
    ledger snapshot."""
    wanted = set(url_hashes)
    hashes = ledger["url_hash"].to_pylist()
    states = ledger["state"].to_pylist()
    new_states = [
        new_state if (h in wanted and s == "ACCEPTED") else s
        for h, s in zip(hashes, states)
    ]
    idx = ledger.column_names.index("state")
    return ledger.set_column(idx, "state", pa.array(new_states, pa.string()))


def ack(ledger: pa.Table, url_hashes) -> pa.Table:
    """S10 accept: ACCEPTED → COMPLETE (the only writer of COMPLETE,
    libcrawl.h:43-44)."""
    return _transition_guarded(ledger, url_hashes, "COMPLETE")


def nack(ledger: pa.Table, url_hashes) -> pa.Table:
    """S10 reject: ACCEPTED → FAILED."""
    return _transition_guarded(ledger, url_hashes, "FAILED")
