"""Segmented-scan scheduler: bit-identical to sequential chaining under any
block partitioning, including a heavily skewed hub host."""

import numpy as np
import pyarrow as pa
import pytest

from anansi_ray.pipelines.scan_scheduler import schedule_scan


def _due_table(seed=7, n=3000):
    rng = np.random.default_rng(seed)
    hosts = np.where(
        rng.random(n) < 0.6, "hub.example.org", None
    )
    hosts = [
        h if h is not None else f"h{int(rng.integers(0, 20))}.example.org"
        for h in hosts
    ]
    states = np.where(rng.random(n) < 0.1, "FORCE", "NEW")
    nf = rng.integers(0, 50_000, n)
    hashes = [f"{int(x):032x}" for x in rng.integers(0, 2**63, n)]
    return pa.table(
        {
            "host": hosts,
            "state": [str(s) for s in states],
            "next_fetch_ms": pa.array(nf, pa.int64()),
            "url_hash": hashes,
        }
    )


def _sequential(due: pa.Table, eu_rate: dict, budget=None):
    """The oracle's per-host chaining, single-threaded."""
    rows = due.to_pylist()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    out = {}
    for host, hr in by_host.items():
        hr.sort(key=lambda r: (r["state"] != "NEW", r["next_fetch_ms"], r["url_hash"]))
        if budget:
            hr = hr[:budget]
        eu, rate = eu_rate[host]
        t = eu
        for r in hr:
            t = max(t, r["next_fetch_ms"])
            out[r["url_hash"]] = t
            t += rate
    return out


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("budget", [None, 5])
def test_scan_matches_sequential(budget):
    import ray.data as rd

    due = _due_table()
    hosts = sorted(set(due["host"].to_pylist()))
    eu_rate = {h: (i * 137, 250 + 50 * (i % 4)) for i, h in enumerate(hosts)}

    expected = _sequential(due, eu_rate, budget)

    # split into many blocks so host segments straddle batch boundaries
    slices = [due.slice(i, 100) for i in range(0, due.num_rows, 100)]
    got_ds = schedule_scan(rd.from_arrow(slices), eu_rate, budget)
    got_df = got_ds.to_pandas()
    got = dict(zip(got_df["url_hash"], got_df["fetch_clock_ms"]))

    assert got == expected
