"""Golden end-to-end conformance: Ray pipeline vs oracle (SURVEY.md §5.2).

Asserts identical crawl order (seq, clock, url, state, status), identical
final URL-seen set, and per-row span-sequence equality on every fetched
document — the BASELINE.json north-star checks.
"""

import pyarrow as pa
import pytest

from anansi_ray import fixtures
from anansi_ray.model import CrawlConfig
from anansi_ray.oracle import reference_crawl


@pytest.fixture(scope="module")
def tiny():
    return fixtures.generate("tiny", seed=42)


def run_both(tiny, budget):
    from anansi_ray.pipelines.crawl import CrawlPipeline

    oracle = reference_crawl(tiny, CrawlConfig(), budget=budget)
    pipe = CrawlPipeline(tiny, CrawlConfig(), budget=budget).run()
    return oracle, pipe


@pytest.mark.usefixtures("ray_session")
class TestConformance:
    @pytest.fixture(scope="class")
    def both(self, tiny):
        return run_both(tiny, budget=None)

    def test_crawl_order_exact(self, both):
        oracle, pipe = both
        exp = oracle["expected_crawl"]
        got = pipe["expected_crawl"]
        assert got is not None
        assert got.num_rows == exp.num_rows
        for col in ("seq", "fetch_clock_ms", "url_hash", "url", "state", "status"):
            assert got[col].to_pylist() == exp[col].to_pylist(), col

    def test_seen_set_exact(self, both):
        oracle, pipe = both
        exp = {
            (r["url_hash"], r["state"]) for r in oracle["ledger"].to_pylist()
        }
        got = {(r["url_hash"], r["state"]) for r in pipe["ledger"].to_pylist()}
        assert got == exp

    def test_ledger_columns_exact(self, both):
        oracle, pipe = both
        cols = [
            "url_hash",
            "url",
            "host",
            "depth",
            "state",
            "status",
            "next_fetch_ms",
            "error_count",
            "soft_error_count",
            "last_ttl_s",
        ]
        exp = {r["url_hash"]: r for r in oracle["ledger"].to_pylist()}
        got_rows = pipe["ledger"].to_pylist()
        assert len(got_rows) == len(exp)
        for r in got_rows:
            e = exp[r["url_hash"]]
            for c in cols:
                assert r[c] == e[c], (r["url"], c)

    def test_document_spans_exact(self, both, tiny):
        oracle, pipe = both
        exp = {r["doc_id"]: r["spans"] for r in oracle["documents"].to_pylist()}
        got = pipe["documents"].to_pylist()
        assert len(got) == len(exp)
        truth = {r["doc_id"]: r["spans"] for r in tiny["documents"].to_pylist()}
        for d in got:
            assert d["spans"] == exp[d["doc_id"]]
            assert d["spans"] == truth[d["doc_id"]]

    def test_budget_1_conformance(self, tiny):
        oracle, pipe = run_both(tiny, budget=1)
        exp, got = oracle["expected_crawl"], pipe["expected_crawl"]
        assert got.num_rows == exp.num_rows
        for col in ("seq", "url_hash", "fetch_clock_ms", "state", "status"):
            assert got[col].to_pylist() == exp[col].to_pylist(), col

    def test_plane_crossing_mid_crawl(self, tiny):
        """Frontier growth crosses the driver/distributed plane threshold
        mid-crawl; the switch must be seamless (identical rules both sides)."""
        from anansi_ray.pipelines.crawl import CrawlPipeline

        oracle = reference_crawl(tiny, CrawlConfig())
        pipe = CrawlPipeline(tiny, CrawlConfig(), driver_plane_threshold=20).run()
        planes = {m["plane"] for m in pipe["metrics"]}
        assert planes == {"driver", "distributed"}  # both exercised
        exp, got = oracle["expected_crawl"], pipe["expected_crawl"]
        assert got.num_rows == exp.num_rows
        for col in ("seq", "url_hash", "fetch_clock_ms", "state", "status"):
            assert got[col].to_pylist() == exp[col].to_pylist(), col

    def test_license_filter_crawl_conformance(self, tiny):
        """F7 enabled end-to-end: only whitelisted-license docs ACCEPTED;
        pipeline still order-exact vs oracle under the altered config."""
        from anansi_ray.fixtures import LICENSES_OK
        from anansi_ray.pipelines.crawl import CrawlPipeline

        # both OK licenses whitelisted: with the reference's filter-before-
        # link-collection order (rdf.c:311-320) REJECTED docs contribute no
        # frontier links, so a narrower whitelist starves the crawl at the
        # seed set
        cfg = CrawlConfig(
            license_filter_enabled=True, license_whitelist=LICENSES_OK
        )
        oracle = reference_crawl(tiny, cfg)
        pipe = CrawlPipeline(tiny, cfg).run()
        exp, got = oracle["expected_crawl"], pipe["expected_crawl"]
        assert got.num_rows == exp.num_rows
        for col in ("seq", "url_hash", "state", "status"):
            assert got[col].to_pylist() == exp[col].to_pylist(), col
        states = got["state"].to_pylist()
        assert states.count("REJECTED") > states.count("ACCEPTED") * 0  # present
        assert "REJECTED" in states and "ACCEPTED" in states
        # strictly fewer ACCEPTED than the unfiltered crawl
        base = reference_crawl(tiny, CrawlConfig())["expected_crawl"]
        assert states.count("ACCEPTED") < base["state"].to_pylist().count("ACCEPTED")

    def test_content_type_policy_crawl_conformance(self, tiny):
        """F2 whitelist end-to-end: non-whitelisted types get synthesized
        406 + SKIPPED; pipeline order-exact vs oracle."""
        from anansi_ray.pipelines.crawl import CrawlPipeline

        cfg = CrawlConfig(
            content_type_whitelist=("text/turtle", "application/rdf+xml")
        )
        oracle = reference_crawl(tiny, cfg)
        pipe = CrawlPipeline(tiny, cfg).run()
        exp, got = oracle["expected_crawl"], pipe["expected_crawl"]
        assert got.num_rows == exp.num_rows
        for col in ("seq", "url_hash", "state", "status"):
            assert got[col].to_pylist() == exp[col].to_pylist(), col
        assert 406 in got["status"].to_pylist()

    def test_distributed_plane_conformance(self, tiny):
        """Force the distributed groupby scheduling/merge path (the 10^10
        shape) and assert it matches the oracle exactly too."""
        from anansi_ray.pipelines.crawl import CrawlPipeline

        oracle = reference_crawl(tiny, CrawlConfig())
        pipe = CrawlPipeline(
            tiny, CrawlConfig(), driver_plane_threshold=0
        ).run()
        exp, got = oracle["expected_crawl"], pipe["expected_crawl"]
        assert got.num_rows == exp.num_rows
        for col in ("seq", "url_hash", "fetch_clock_ms", "state", "status"):
            assert got[col].to_pylist() == exp[col].to_pylist(), col
        exp_l = {
            (r["url_hash"], r["state"]) for r in oracle["ledger"].to_pylist()
        }
        got_l = {(r["url_hash"], r["state"]) for r in pipe["ledger"].to_pylist()}
        assert got_l == exp_l


@pytest.mark.usefixtures("ray_session")
def test_bucketed_store_distributed_plane_conformance(tmp_path):
    """The at-scale fetch path end-to-end: distributed scheduling plane +
    bucketed web store (frontier metadata hash-exchanged on the cache-bucket
    key, per-bucket partition-pruned lookups — no whole-web broadcast) must
    match the oracle exactly."""
    from anansi_ray import fixtures
    from anansi_ray.oracle import reference_crawl
    from anansi_ray.pipelines.crawl import CrawlPipeline

    tiny = fixtures.generate("tiny", seed=42)
    oracle = reference_crawl(tiny, CrawlConfig())
    pipe = CrawlPipeline(
        tiny,
        CrawlConfig(),
        driver_plane_threshold=0,
        web_store_dir=str(tmp_path / "webstore"),
        web_store_buckets=8,
    ).run()
    exp, got = oracle["expected_crawl"], pipe["expected_crawl"]
    assert got.num_rows == exp.num_rows
    for col in ("seq", "url_hash", "fetch_clock_ms", "state", "status"):
        assert got[col].to_pylist() == exp[col].to_pylist(), col
    exp_l = {(r["url_hash"], r["state"]) for r in oracle["ledger"].to_pylist()}
    got_l = {(r["url_hash"], r["state"]) for r in pipe["ledger"].to_pylist()}
    assert got_l == exp_l


@pytest.mark.usefixtures("ray_session")
class TestPriorityOrder:
    """Engine-extension priority queue (north_star: 'priority queue keyed
    by crawl depth + RDF link score'): NEW rows dequeue by in-degree link
    score desc, then depth asc, then the O1 tail; pipeline order-exact vs
    the oracle under the same mode, on BOTH control planes."""

    def test_priority_conformance_driver_plane(self, tiny):
        from anansi_ray.pipelines.crawl import CrawlPipeline

        cfg = CrawlConfig(use_priority=True)
        oracle = reference_crawl(tiny, cfg)
        pipe = CrawlPipeline(tiny, cfg).run()
        exp, got = oracle["expected_crawl"], pipe["expected_crawl"]
        assert got.num_rows == exp.num_rows
        for col in ("seq", "url_hash", "fetch_clock_ms", "state", "status"):
            assert got[col].to_pylist() == exp[col].to_pylist(), col

    def test_priority_conformance_distributed_plane(self, tiny):
        from anansi_ray.pipelines.crawl import CrawlPipeline

        cfg = CrawlConfig(use_priority=True)
        oracle = reference_crawl(tiny, cfg)
        pipe = CrawlPipeline(tiny, cfg, driver_plane_threshold=0).run()
        exp, got = oracle["expected_crawl"], pipe["expected_crawl"]
        assert got.num_rows == exp.num_rows
        for col in ("seq", "url_hash", "fetch_clock_ms", "state", "status"):
            assert got[col].to_pylist() == exp[col].to_pylist(), col

    def test_priority_changes_order_not_seen_set(self, tiny):
        base = reference_crawl(tiny, CrawlConfig())
        prio = reference_crawl(tiny, CrawlConfig(use_priority=True))
        assert set(prio["expected_crawl"]["url_hash"].to_pylist()) == set(
            base["expected_crawl"]["url_hash"].to_pylist()
        )
        # link scores populated: some discovered row has in-degree > 1
        assert max(prio["ledger"]["priority"].to_pylist()) > 1.0

    def test_hub_pages_scored_higher(self, tiny):
        prio = reference_crawl(tiny, CrawlConfig(use_priority=True))
        led = prio["ledger"].to_pylist()
        scored = [r for r in led if r["depth"] > 0]
        assert scored
        # priority equals the number of referring occurrences accumulated
        # at discovery; all non-seed rows have at least one referrer
        assert all(r["priority"] >= 1.0 for r in scored if r["added_round"] > 0)


@pytest.mark.usefixtures("ray_session")
def test_actor_pool_fetcher_and_groupby_scheduler_variants(tiny):
    """The documented alternates produce identical results: the Fetcher
    ACTOR-POOL stage vs the cached stateless task, and the
    groupby(host).map_groups scheduler vs the vectorized driver plane."""
    import ray
    import ray.data as rd

    from anansi_ray.pipelines.crawl import (
        _make_scheduler,
        _schedule_on_driver,
    )
    from anansi_ray.stages.fetch import Fetcher, _webrow_dicts, make_fetch_fn
    from anansi_ray.canon import canon_batch

    cfg = CrawlConfig()
    web_ref = ray.put(_webrow_dicts(tiny["web"]))
    robots = {
        r["host"]: r.get("robots_disallow") or []
        for r in tiny["hosts"].to_pylist()
        if r.get("robots_disallow")
    }
    robots_ref = ray.put(robots)

    c = canon_batch(tiny["web"]["url"].to_pylist()[:64])
    due = pa.table(
        {
            "url": pa.array(c["url"]),
            "url_hash": pa.array(c["url_hash"]),
            "host": pa.array(c["host"]),
            "state": pa.array(["NEW"] * len(c["url"])),
            "status": pa.array([0] * len(c["url"]), pa.int32()),
            "next_fetch_ms": pa.array([0] * len(c["url"]), pa.int64()),
            "updated_ms": pa.array([0] * len(c["url"]), pa.int64()),
        }
    )
    hosts = {h: (0, 1000) for h in set(c["host"])}

    # scheduler variants agree on slots
    sched_a = _schedule_on_driver(due, hosts, budget=None)
    eu_ref = ray.put(hosts)
    sched_b_ds = (
        rd.from_arrow(due)
        .groupby("host")
        .map_groups(_make_scheduler(None, eu_ref), batch_format="pyarrow")
    )
    slots_a = dict(zip(sched_a["url_hash"].to_pylist(), sched_a["fetch_clock_ms"].to_pylist()))
    b = sched_b_ds.to_pandas()
    slots_b = dict(zip(b["url_hash"], b["fetch_clock_ms"]))
    assert slots_a == slots_b

    # fetch variants agree row-for-row
    out_task = (
        rd.from_arrow(sched_a)
        .map_batches(make_fetch_fn(web_ref, robots_ref, cfg), batch_format="pyarrow")
        .to_pandas()
        .sort_values("url_hash")
    )
    out_actor = (
        rd.from_arrow(sched_a)
        .map_batches(
            Fetcher,
            fn_constructor_args=(web_ref, robots_ref, cfg),
            concurrency=2,
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("url_hash")
    )
    for col in ("url_hash", "state", "status", "content_type"):
        assert out_task[col].tolist() == out_actor[col].tolist(), col


@pytest.mark.usefixtures("ray_session")
def test_terminate_gate_stops_between_rounds(tiny, tmp_path):
    """F9 — request_stop() ends the loop at the next round boundary and the
    checkpoint allows seamless resume to the same final state."""
    from anansi_ray.pipelines.crawl import CrawlPipeline

    cfg = CrawlConfig(checkpoint_dir=str(tmp_path / "ck"))
    full = reference_crawl(tiny, cfg)

    p1 = CrawlPipeline(tiny, cfg, checkpoint_every=1)
    for _ in range(3):
        p1.run_round()
    p1.request_stop()
    res1 = p1.run()  # returns immediately, in-flight state checkpointed
    assert res1["rounds"] == 3
    assert res1["fetches"] == 0  # no rounds ran after the stop

    latest = CrawlPipeline.latest_checkpoint(str(tmp_path / "ck"))
    p2 = CrawlPipeline(tiny, cfg)
    p2.restore(latest)
    res2 = p2.run()
    exp, got = full["expected_crawl"], res2["expected_crawl"]
    assert got.num_rows == exp.num_rows
    for col in ("seq", "url_hash", "state", "status"):
        assert got[col].to_pylist() == exp[col].to_pylist(), col


@pytest.mark.usefixtures("ray_session")
def test_sharded_host_state_conformance(tiny):
    """ST2 at the 10^8-host shape: the sharded crawl_root actor backend
    must reproduce the driver-dict crawl exactly (order, states, ledger)."""
    from anansi_ray.pipelines.crawl import CrawlPipeline

    cfg = CrawlConfig(host_state_backend="sharded", host_state_shards=4)
    oracle = reference_crawl(tiny, CrawlConfig())
    pipe = CrawlPipeline(tiny, cfg).run()
    exp, got = oracle["expected_crawl"], pipe["expected_crawl"]
    assert got.num_rows == exp.num_rows
    for col in ("seq", "url_hash", "fetch_clock_ms", "state", "status"):
        assert got[col].to_pylist() == exp[col].to_pylist(), col


@pytest.mark.usefixtures("ray_session")
def test_all_scale_paths_on_conformance(tiny, tmp_path):
    """Everything-on integration: distributed control plane + bucketed web
    store + sharded host state + priority dequeue, all at once, must still
    be order-exact vs the oracle."""
    from anansi_ray.pipelines.crawl import CrawlPipeline

    cfg = CrawlConfig(
        use_priority=True,
        host_state_backend="sharded",
        host_state_shards=4,
    )
    oracle = reference_crawl(tiny, cfg)
    pipe = CrawlPipeline(
        tiny,
        cfg,
        driver_plane_threshold=0,
        web_store_dir=str(tmp_path / "store"),
        web_store_buckets=8,
        spool_dir=str(tmp_path / "spool"),
    ).run()
    exp, got = oracle["expected_crawl"], pipe["expected_crawl"]
    assert got.num_rows == exp.num_rows
    for col in ("seq", "url_hash", "fetch_clock_ms", "state", "status"):
        assert got[col].to_pylist() == exp[col].to_pylist(), col
    exp_l = {
        (r["url_hash"], r["state"], r["priority"])
        for r in oracle["ledger"].to_pylist()
    }
    got_l = {
        (r["url_hash"], r["state"], r["priority"])
        for r in pipe["ledger"].to_pylist()
    }
    assert got_l == exp_l


@pytest.mark.usefixtures("ray_session")
def test_actor_pool_fetch_flavor_conformance(tiny):
    """cfg.fetch_actor_pool routes the fetch stage through the Fetcher
    actor pool (ST3) — the crawl must stay order-exact."""
    from anansi_ray.pipelines.crawl import CrawlPipeline

    cfg = CrawlConfig(fetch_actor_pool=True, fetch_concurrency=2)
    oracle = reference_crawl(tiny, CrawlConfig())
    pipe = CrawlPipeline(tiny, cfg).run()
    exp, got = oracle["expected_crawl"], pipe["expected_crawl"]
    assert got.num_rows == exp.num_rows
    for col in ("seq", "url_hash", "fetch_clock_ms", "state", "status"):
        assert got[col].to_pylist() == exp[col].to_pylist(), col


class TestVectorizedDriverKernels:
    """Pin the vectorized driver-plane kernels against straightforward
    per-row loop references (the pre-vectorization implementations) on
    randomized inputs — no Ray session needed, both are pure functions."""

    @staticmethod
    def _random_due(rng, n_hosts=7, n_rows=200):
        import numpy as np

        hosts = [f"h{i}.example.org" for i in range(n_hosts)]
        hcol = [hosts[rng.integers(0, n_hosts)] for _ in range(n_rows)]
        return pa.table(
            {
                "url": pa.array([f"http://{h}/r/{i}" for i, h in enumerate(hcol)]),
                "url_hash": pa.array([f"{rng.integers(0, 2**63):016x}" for _ in range(n_rows)]),
                "host": pa.array(hcol),
                "state": pa.array(
                    [("NEW", "ACCEPTED", "SKIPPED")[rng.integers(0, 3)] for _ in range(n_rows)]
                ),
                "status": pa.array(np.zeros(n_rows, np.int32)),
                "next_fetch_ms": pa.array(
                    rng.integers(0, 20_000, n_rows).astype(np.int64)
                ),
                "updated_ms": pa.array(np.zeros(n_rows, np.int64)),
            }
        )

    @staticmethod
    def _schedule_loop_reference(due_tbl, due_hosts, budget, keys):
        """The former per-row implementation: causal slot chain
        t_j = max(t_{j-1} + rate, nf_j) walked in sorted order."""
        import numpy as np
        import pyarrow.compute as pc

        g = due_tbl.append_column("_old", pc.not_equal(due_tbl["state"], "NEW"))
        order = pc.sort_indices(g, sort_keys=[("host", "ascending")] + keys)
        g = g.take(order).drop_columns(["_old"])
        hosts = g["host"].to_pylist()
        nf = g["next_fetch_ms"].to_numpy(zero_copy_only=False)
        n = len(hosts)
        slots = np.empty(n, dtype=np.int64)
        keep = np.ones(n, dtype=bool)
        cur, t, rate, k = None, 0, 0, 0
        for i in range(n):
            if hosts[i] != cur:
                cur = hosts[i]
                t, rate = due_hosts[cur]
                k = 0
            k += 1
            if budget and k > budget:
                keep[i] = False
                continue
            t = max(t, int(nf[i]))
            slots[i] = t
            t += rate
        g = g.append_column("fetch_clock_ms", pa.array(slots, pa.int64()))
        return g.filter(pa.array(keep)) if not keep.all() else g

    @pytest.mark.parametrize("budget", [None, 1, 3])
    def test_schedule_matches_loop_reference(self, budget):
        import numpy as np

        from anansi_ray.pipelines.crawl import ORDER_REFERENCE, _schedule_on_driver

        rng = np.random.default_rng(7)
        for trial in range(5):
            due = self._random_due(rng)
            hosts = {
                h: (int(rng.integers(0, 5000)), int(rng.integers(500, 2000)))
                for h in set(due["host"].to_pylist())
            }
            got = _schedule_on_driver(due, hosts, budget=budget)
            exp = self._schedule_loop_reference(due, hosts, budget, ORDER_REFERENCE)
            assert got.num_rows == exp.num_rows, (trial, budget)
            for col in ("url_hash", "host", "fetch_clock_ms"):
                assert got[col].to_pylist() == exp[col].to_pylist(), (trial, budget, col)

    def test_schedule_empty_and_single_row(self):
        from anansi_ray.pipelines.crawl import _schedule_on_driver

        import numpy as np

        rng = np.random.default_rng(0)
        due = self._random_due(rng, n_hosts=1, n_rows=1)
        hosts = {due["host"][0].as_py(): (100, 1000)}
        got = _schedule_on_driver(due, hosts, budget=None)
        assert got.num_rows == 1
        assert got["fetch_clock_ms"][0].as_py() == max(
            100, due["next_fetch_ms"][0].as_py()
        )
        empty = due.slice(0, 0)
        assert _schedule_on_driver(empty, hosts, budget=None).num_rows == 0

    def test_merge_candidates_matches_loop_reference(self):
        import numpy as np
        import pyarrow.compute as pc

        from anansi_ray.pipelines.crawl import _merge_candidates_on_driver

        rng = np.random.default_rng(11)
        n = 300
        cand = pa.table(
            {
                "url": pa.array([f"http://x/{i%40}" for i in range(n)]),
                "url_hash": pa.array([f"{rng.integers(0, 40):04x}" for _ in range(n)]),
                "host": pa.array(["x"] * n),
                "depth": pa.array(rng.integers(0, 4, n).astype(np.int32)),
                # real candidate scores are integer in-degree counts
                # (_ExpandLinks: one point per referrer) — exact under any
                # summation order
                "score": pa.array(rng.integers(1, 5, n).astype(np.float64)),
                "next_fetch_ms": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
            }
        )
        got = _merge_candidates_on_driver(cand)

        # loop reference: first row in (url_hash, next_fetch_ms, depth)
        # order wins; scores accumulate left-to-right per hash
        order = pc.sort_indices(
            cand,
            sort_keys=[
                ("url_hash", "ascending"),
                ("next_fetch_ms", "ascending"),
                ("depth", "ascending"),
            ],
        )
        t = cand.take(order)
        hashes = t["url_hash"].to_pylist()
        scores = t["score"].to_numpy(zero_copy_only=False).copy()
        keep = np.ones(len(hashes), dtype=bool)
        first = 0
        for i in range(1, len(hashes)):
            if hashes[i] == hashes[first]:
                keep[i] = False
                scores[first] += scores[i]
            else:
                first = i
        exp = t.set_column(
            t.column_names.index("score"), "score", pa.array(scores, pa.float64())
        ).filter(pa.array(keep))

        assert got.num_rows == exp.num_rows
        for col in ("url_hash", "next_fetch_ms", "depth"):
            assert got[col].to_pylist() == exp[col].to_pylist(), col
        # integral scores sum exactly under any summation order
        assert got["score"].to_pylist() == exp["score"].to_pylist()

    def test_hex128_matches_int_parse(self):
        """The numeric merge key: (hi, lo) halves must equal int(h, 16)
        split at bit 64, for md5-shaped 32-char lowercase hex."""
        import hashlib

        import numpy as np

        from anansi_ray.pipelines.crawl import _hex128

        hs = [hashlib.md5(str(i).encode()).hexdigest() for i in range(500)]
        hs += ["0" * 32, "f" * 32, "0123456789abcdef" * 2]
        hi, lo = _hex128(pa.array(hs, pa.string()))
        for h, a, b in zip(hs, hi, lo):
            v = int(h, 16)
            assert int(a) == v >> 64 and int(b) == v & ((1 << 64) - 1), h
        # mixed widths must refuse (callers fall back to the string sort)
        assert _hex128(pa.array(["ab", "0" * 32])) is None

    def test_merge_candidates_numeric_path_matches_string_sort(self):
        """32-char hex hashes take the lexsort path; its output must be
        byte-identical to the string-sort definition (hex lexicographic
        order ≡ 128-bit numeric order)."""
        import hashlib

        import numpy as np
        import pyarrow.compute as pc

        from anansi_ray.pipelines.crawl import _merge_candidates_on_driver

        rng = np.random.default_rng(23)
        n = 400
        pool = [hashlib.md5(str(i).encode()).hexdigest() for i in range(60)]
        cand = pa.table(
            {
                "url": pa.array([f"http://x/{i}" for i in range(n)]),
                "url_hash": pa.array([pool[i] for i in rng.integers(0, 60, n)]),
                "host": pa.array(["x"] * n),
                "depth": pa.array(rng.integers(0, 4, n).astype(np.int32)),
                "score": pa.array(rng.integers(1, 5, n).astype(np.float64)),
                "next_fetch_ms": pa.array(rng.integers(0, 50, n).astype(np.int64)),
            }
        )
        got = _merge_candidates_on_driver(cand)
        order = pc.sort_indices(
            cand,
            sort_keys=[
                ("url_hash", "ascending"),
                ("next_fetch_ms", "ascending"),
                ("depth", "ascending"),
            ],
        )
        t = cand.take(order)
        hashes = t["url_hash"].combine_chunks()
        first = np.ones(n, dtype=bool)
        first[1:] = pc.not_equal(
            hashes.slice(1), hashes.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(t["score"].to_numpy(zero_copy_only=False), starts)
        exp = t.filter(pa.array(first))
        exp = exp.set_column(
            exp.column_names.index("score"), "score", pa.array(sums, pa.float64())
        )
        assert got.equals(exp)

    def test_merge_candidates_empty(self):
        from anansi_ray.pipelines.crawl import _merge_candidates_on_driver

        empty = pa.table(
            {
                "url": pa.array([], pa.string()),
                "url_hash": pa.array([], pa.string()),
                "host": pa.array([], pa.string()),
                "depth": pa.array([], pa.int32()),
                "score": pa.array([], pa.float64()),
                "next_fetch_ms": pa.array([], pa.int64()),
            }
        )
        assert _merge_candidates_on_driver(empty).num_rows == 0
