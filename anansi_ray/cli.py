"""CLI entry points — equivalents of the reference's operator tools:

* ``add``        ≙ crawler-add (single + bulk + -f force, add.c:44-209)
* ``crawl``      ≙ crawld one-shot (crawld.c:36-103; resumable)
* ``locate``     ≙ crawl-locate cache lookup by key (utils/crawl-locate.c:40-85)
* ``export``     ≙ MQ consumer view (mq/mq.c:271-339)
* ``partition``  ≙ crawler-partition root labels (crawler/partition.c:78-85)

Owns its Ray session (guarded init) — library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def _load_fixture(fdir: str) -> dict[str, pa.Table]:
    return {
        name: pq.read_table(os.path.join(fdir, f"{name}.parquet"))
        for name in ("seeds", "web", "hosts", "documents")
    }


def cmd_add(args) -> int:
    """Append seed URLs (canonicalized) to a seeds parquet (S1/S2)."""
    from anansi_ray.canon import canonicalize

    urls: list[str] = list(args.url)
    if args.file:
        with open(args.file) as f:
            urls += [line.strip() for line in f if line.strip()]
    if args.stdin:
        urls += [line.strip() for line in sys.stdin if line.strip()]
    rows, skipped = [], 0
    for u in urls:
        c = canonicalize(u)
        if c is None or "://" not in c:
            skipped += 1
            continue
        rows.append({"url": c, "force": bool(args.force)})
    existing = None
    if os.path.exists(args.seeds):
        existing = pq.read_table(args.seeds)
    new = pa.Table.from_pylist(
        rows, schema=pa.schema([("url", pa.string()), ("force", pa.bool_())])
    )
    out = pa.concat_tables([existing, new]) if existing is not None else new
    pq.write_table(out, args.seeds)
    print(f"added {len(rows)} seeds ({skipped} skipped) -> {args.seeds}")
    return 0


def cmd_crawl(args) -> int:
    _ray()
    from anansi_ray.model import CrawlConfig
    from anansi_ray.pipelines.crawl import CrawlPipeline

    tables = _load_fixture(args.fixture)
    if args.seeds and os.path.exists(args.seeds):
        tables["seeds"] = pq.read_table(args.seeds)
    if args.config:
        from anansi_ray.model import config_from_file

        cfg = config_from_file(args.config)
        cfg.checkpoint_dir = os.path.join(args.out, "checkpoints")
        cfg.use_priority = bool(args.priority)
        cfg.host_state_backend = args.host_state
    else:
        cfg = CrawlConfig(
            checkpoint_dir=os.path.join(args.out, "checkpoints"),
            use_priority=bool(args.priority),
            host_state_backend=args.host_state,
        )
    if args.processor:
        cfg.processor_name = args.processor
    if args.policies:
        cfg.policies = tuple(args.policies.split(","))
    pipe = CrawlPipeline(
        tables,
        cfg,
        output_dir=args.out,
        checkpoint_every=args.checkpoint_every,
        web_store_dir=args.web_store,
        instance_id=args.instance,
    )
    if args.resume:
        latest = CrawlPipeline.latest_checkpoint(cfg.checkpoint_dir)
        if latest:
            pipe.restore(latest)
            print(f"resumed from {latest}")
    res = pipe.run()
    pipe.checkpoint()
    ledger = res["ledger"]
    pq.write_table(ledger, os.path.join(args.out, "ledger.parquet"))
    if res["expected_crawl"] is not None:
        pq.write_table(res["expected_crawl"], os.path.join(args.out, "crawl_order.parquet"))
    from collections import Counter

    states = Counter(ledger["state"].to_pylist())
    print(
        f"rounds={res['rounds']} fetches={res['fetches']} "
        f"ledger={ledger.num_rows} states={dict(states)}"
    )
    return 0


def cmd_locate(args) -> int:
    """S8: look up a fetched object by URL/cache key without fetching."""
    from anansi_ray.canon import cache_key, canonicalize

    c = canonicalize(args.url)
    if c is None:
        print("unparseable URL", file=sys.stderr)
        return 1
    key = cache_key(c)
    ledger_path = os.path.join(args.out, "ledger.parquet")
    if os.path.exists(ledger_path):
        t = pq.read_table(ledger_path)
        rows = t.filter(pa.compute.equal(t["url_hash"], key)).to_pylist()
        if rows:
            r = rows[0]
            print(
                f"key={key} state={r['state']} status={r['status']} "
                f"updated_ms={r['updated_ms']} url={r['url']}"
            )
            return 0
    print(f"key={key} (not crawled)")
    return 2


def cmd_export(args) -> int:
    from anansi_ray.pipelines.export import accepted_export

    t = pq.read_table(os.path.join(args.out, "ledger.parquet"))
    view = accepted_export(t, node_id=args.node_id, node_count=args.node_count)
    dest = os.path.join(args.out, f"export_node{args.node_id}.parquet")
    pq.write_table(view, dest)
    print(f"{view.num_rows} ACCEPTED rows -> {dest}")
    return 0


def cmd_partition(args) -> int:
    """Assign a partition label to a host root (crawl_root.partition)."""
    path = args.hosts
    t = pq.read_table(path)
    hosts = t["host"].to_pylist()
    if args.host not in hosts:
        print(f"unknown host {args.host}", file=sys.stderr)
        return 1
    parts = t["partition"].to_pylist()
    parts = [args.label if h == args.host else p for h, p in zip(hosts, parts)]
    idx = t.column_names.index("partition")
    t = t.set_column(idx, "partition", pa.array(parts, pa.string()))
    pq.write_table(t, path)
    print(f"{args.host} -> partition {args.label}")
    return 0


def cmd_query(args) -> int:
    """Run any registered pipeline/operator over an sf_dir of parquet
    tables — the product surface for the query registry: write the result
    as parquet (resumable downstream) or print a head sample."""
    from anansi_ray.pipelines.queries import QUERIES

    if args.list:
        for name in sorted(QUERIES):
            print(name)
        return 0
    if not args.name:
        print("query name required (or --list)", file=sys.stderr)
        return 1
    if args.name not in QUERIES:
        print(f"unknown query {args.name!r} (see --list)", file=sys.stderr)
        return 1
    import ray.data as rd

    fn = QUERIES[args.name][0]
    res = fn(args.sf_dir)
    if isinstance(res, rd.Dataset):
        if args.out:
            # partitioned parquet: one file per block, restart-skippable
            res.write_parquet(args.out)
            print(f"{args.name}: dataset -> {args.out}")
            return 0
        res = res.limit(args.head).to_pandas()
        print(res.to_string(index=False))
        return 0
    tbl = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
    if args.out:
        if args.out.endswith(".parquet") and not os.path.isdir(args.out):
            pq.write_table(tbl, args.out)
        else:
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(tbl, os.path.join(args.out, "part-0.parquet"))
        print(f"{args.name}: {tbl.num_rows} rows -> {args.out}")
        return 0
    print(tbl.slice(0, args.head).to_pandas().to_string(index=False))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="anansi-ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("add", help="add seed URLs (≙ crawler-add)")
    a.add_argument("url", nargs="*")
    a.add_argument("-f", "--force", action="store_true")
    a.add_argument("--file")
    a.add_argument("--stdin", action="store_true")
    a.add_argument("--seeds", default="seeds.parquet")
    a.set_defaults(fn=cmd_add)

    c = sub.add_parser("crawl", help="run the crawl round loop (≙ crawld)")
    c.add_argument("--fixture", required=True)
    c.add_argument("--seeds")
    c.add_argument("--out", required=True)
    c.add_argument("--checkpoint-every", type=int, default=8)
    c.add_argument(
        "--config",
        help="engine config file: crawl.conf-shaped .ini/.conf or .json "
        "(≙ crawld config_init/load)",
    )
    c.add_argument("--resume", action="store_true")
    c.add_argument(
        "--priority",
        action="store_true",
        help="dequeue by link score + depth instead of the reference O1 order",
    )
    c.add_argument(
        "--processor", help='payload processor name ("rdf", "lod", "html", ...)'
    )
    c.add_argument(
        "--policies", help="comma-separated policy chain (default schemes,robots,content-types)"
    )
    c.add_argument(
        "--web-store",
        help="bucketed web store dir (built on first use): no whole-web broadcast",
    )
    c.add_argument(
        "--host-state",
        choices=("driver", "sharded"),
        default="driver",
        help="politeness-state backend (sharded = crawl_root actor shards)",
    )
    c.add_argument(
        "--instance",
        help="crawl instance id stamped per spool row + manifest "
        "(≙ crawl_instance, db.c:354; default crawl-0)",
    )
    c.set_defaults(fn=cmd_crawl)

    l = sub.add_parser("locate", help="cache lookup by key (≙ crawl-locate)")
    l.add_argument("url")
    l.add_argument("--out", required=True)
    l.set_defaults(fn=cmd_locate)

    e = sub.add_parser("export", help="ACCEPTED export view (≙ MQ consumer)")
    e.add_argument("--out", required=True)
    e.add_argument("--node-id", type=int, default=0)
    e.add_argument("--node-count", type=int, default=1)
    e.set_defaults(fn=cmd_export)

    q = sub.add_parser(
        "query", help="run a registered pipeline over an sf_dir of tables"
    )
    q.add_argument("name", nargs="?")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", help="write result parquet here instead of printing")
    q.add_argument("--head", type=int, default=20)
    q.add_argument("--list", action="store_true", help="list query names")
    q.set_defaults(fn=cmd_query)

    pt = sub.add_parser("partition", help="label a host root (≙ crawler-partition)")
    pt.add_argument("--hosts", required=True)
    pt.add_argument("--host", required=True)
    pt.add_argument("--label", required=True)
    pt.set_defaults(fn=cmd_partition)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
