"""Per-host politeness/eligibility state (≙ ``crawl_root``,
/root/reference/libspider/queues/db.c:279-338) behind a two-backend facade.

The driver backend is a plain dict — O(#hosts) driver memory, zero RPC,
the right call to ~10^7 hosts.  The sharded backend spreads the
authoritative state over ``hash(host) % n`` actors (the same uniform
partitioning as the URL-seen shards) with BATCH RPCs per round: at 10^8+
hosts the driver no longer owns the table, it only assembles the round's
due-host view (hosts with eligible rows), which is bounded by the round's
actual work, not the host universe.

Both backends expose the identical five-operation surface the round loop
uses; the conformance suite runs the crawl on both and requires exact
crawl-order equality.

Facade operations (all batched):

* ``ensure_hosts([(host, rate_ms)])``   — insert-if-absent (≙ crawl_root
  probe-before-insert, db.c:1267-1294)
* ``add_eligible([(host, n)])``         — eligibility counter bump on
  discovery / horizon re-admission
* ``apply_fetch([(host, tmax_ms, n)])`` — post-round politeness advance:
  ``eu = tmax + rate`` and ``eligible -= n`` (≙ the earliest_update write
  inside the dequeue txn, db.c:762-790)
* ``due_hosts()``                       — {host: (eu, rate)} for hosts with
  eligible > 0 and rate > 0 (db.c:687 requires rate > 0)
* ``eligible_total()``                  — scalar for the control-plane
  threshold
"""

from __future__ import annotations

import zlib

import ray


def _shard_of(host: str, n: int) -> int:
    return zlib.crc32(host.encode()) % n


@ray.remote(num_cpus=0)
class HostStateShard:
    """One shard of the crawl_root table: host -> [eu_ms, rate_ms, eligible]."""

    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        self.state: dict[str, list[int]] = {}

    def ensure_hosts(self, items: list[tuple[str, int]]) -> None:
        st = self.state
        for host, rate in items:
            if host not in st:
                st[host] = [0, int(rate), 0]

    def add_eligible(self, items: list[tuple[str, int]]) -> None:
        st = self.state
        for host, n in items:
            st[host][2] += n

    def apply_fetch(self, items: list[tuple[str, int, int]]) -> None:
        st = self.state
        for host, tmax, n in items:
            row = st[host]
            row[0] = int(tmax) + row[1]
            row[2] -= n

    def due_hosts(self) -> dict[str, tuple[int, int]]:
        return {
            h: (row[0], row[1])
            for h, row in self.state.items()
            if row[2] > 0 and row[1] > 0
        }

    def eligible_total(self) -> int:
        return sum(row[2] for row in self.state.values() if row[1] > 0)

    def snapshot(self) -> dict[str, list[int]]:
        return self.state

    def restore(self, state: dict[str, list[int]]) -> None:
        self.state = {h: list(v) for h, v in state.items()}


class DriverHostState:
    """Dict backend — the sub-10^7-host default."""

    def __init__(self, default_rate_ms: int):
        self.default_rate_ms = default_rate_ms
        self.state: dict[str, list[int]] = {}

    def ensure_hosts(self, items) -> None:
        st = self.state
        for host, rate in items:
            if host not in st:
                st[host] = [0, int(rate), 0]

    def add_eligible(self, items) -> None:
        for host, n in items:
            self.state[host][2] += n

    def apply_fetch(self, items) -> None:
        for host, tmax, n in items:
            row = self.state[host]
            row[0] = int(tmax) + row[1]
            row[2] -= n

    def due_hosts(self) -> dict[str, tuple[int, int]]:
        return {
            h: (row[0], row[1])
            for h, row in self.state.items()
            if row[2] > 0 and row[1] > 0
        }

    def eligible_total(self) -> int:
        return sum(row[2] for row in self.state.values() if row[1] > 0)

    def snapshot(self) -> dict[str, list[int]]:
        return self.state

    def restore(self, state) -> None:
        self.state = {h: list(v) for h, v in state.items()}


class ShardedHostState:
    """Actor-pool backend: batch scatter per operation, gather for views.

    ``due_hosts()`` still assembles a driver-side dict — that view is
    bounded by hosts with WORK this round, and it is what the schedulers
    broadcast; the full host universe never lives on the driver."""

    def __init__(self, num_shards: int, default_rate_ms: int):
        self.num_shards = num_shards
        self.default_rate_ms = default_rate_ms
        self.shards = [HostStateShard.remote(i) for i in range(num_shards)]

    def _scatter(self, method: str, items) -> None:
        per: list[list] = [[] for _ in range(self.num_shards)]
        n = self.num_shards
        for it in items:
            per[_shard_of(it[0], n)].append(it)
        futs = [
            getattr(self.shards[s], method).remote(per[s])
            for s in range(self.num_shards)
            if per[s]
        ]
        ray.get(futs)

    def ensure_hosts(self, items) -> None:
        self._scatter("ensure_hosts", list(items))

    def add_eligible(self, items) -> None:
        self._scatter("add_eligible", list(items))

    def apply_fetch(self, items) -> None:
        self._scatter("apply_fetch", list(items))

    def due_hosts(self) -> dict[str, tuple[int, int]]:
        out: dict[str, tuple[int, int]] = {}
        for d in ray.get([s.due_hosts.remote() for s in self.shards]):
            out.update(d)
        return out

    def eligible_total(self) -> int:
        return sum(ray.get([s.eligible_total.remote() for s in self.shards]))

    def snapshot(self) -> dict[str, list[int]]:
        out: dict[str, list[int]] = {}
        for d in ray.get([s.snapshot.remote() for s in self.shards]):
            out.update(d)
        return out

    def restore(self, state) -> None:
        per: list[dict] = [{} for _ in range(self.num_shards)]
        for h, v in state.items():
            per[_shard_of(h, self.num_shards)][h] = v
        ray.get(
            [self.shards[s].restore.remote(per[s]) for s in range(self.num_shards)]
        )


def make_host_state(backend: str, default_rate_ms: int, num_shards: int = 8):
    if backend == "sharded":
        return ShardedHostState(num_shards, default_rate_ms)
    return DriverHostState(default_rate_ms)
