"""MQ-equivalent export (S9/S10) + CLI tool tests."""

import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anansi_ray import fixtures
from anansi_ray.pipelines.export import accepted_export, ack, nack

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ledger():
    return pa.table(
        {
            "url": [f"http://h/{i}" for i in range(6)],
            "url_hash": [f"{i:032x}" for i in range(6)],
            "state": ["ACCEPTED", "ACCEPTED", "NEW", "FAILED", "ACCEPTED", "COMPLETE"],
            "status": pa.array([200] * 6, pa.int32()),
            "updated_ms": pa.array([50, 10, 0, 5, 99, 1], pa.int64()),
        }
    )


class TestExport:
    def test_accepted_view_order(self):
        v = accepted_export(_ledger())
        assert v.num_rows == 3
        assert v["updated_ms"].to_pylist() == [99, 50, 10]  # O3: updated DESC
        assert v["mq_uri"][0].as_py().startswith("anansi:///")

    def test_node_sharding_partitions(self):
        led = _ledger()
        total = accepted_export(led).num_rows
        n0 = accepted_export(led, 0, 2).num_rows
        n1 = accepted_export(led, 1, 2).num_rows
        assert n0 + n1 == total

    def test_ack_guarded(self):
        led = _ledger()
        out = ack(led, {led["url_hash"][1].as_py(), led["url_hash"][2].as_py()})
        states = out["state"].to_pylist()
        assert states[1] == "COMPLETE"      # was ACCEPTED
        assert states[2] == "NEW"           # guard: only ACCEPTED moves
        assert states[0] == "ACCEPTED"      # untouched

    def test_nack(self):
        led = _ledger()
        out = nack(led, {led["url_hash"][0].as_py()})
        assert out["state"].to_pylist()[0] == "FAILED"


@pytest.mark.usefixtures("ray_session")
def test_cli_end_to_end(tmp_path):
    """add → crawl → locate → export via subprocess (the CLI owns its Ray)."""
    fdir = fixtures.ensure_fixture("tiny")
    out = str(tmp_path / "out")
    seeds = str(tmp_path / "seeds.parquet")

    env = dict(os.environ, PYTHONPATH=REPO, RAY_GRAFT_CPUS="4")

    def run(*args):
        return subprocess.run(
            [sys.executable, "-m", "anansi_ray.cli", *args],
            env=env,
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=400,
        )

    seed_url = pq.read_table(os.path.join(fdir, "seeds.parquet"))["url"][0].as_py()
    r = run("add", "--seeds", seeds, seed_url, "HTTP://H0.Example.ORG:80/r/0#x")
    assert r.returncode == 0, r.stderr
    assert pq.read_table(seeds).num_rows >= 1

    r = run("crawl", "--fixture", fdir, "--seeds", seeds, "--out", out)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "ledger.parquet"))
    # documents/cache are column-pruned views over the fused per-round spool
    assert os.path.isdir(os.path.join(out, "spool"))
    from anansi_ray.pipelines.crawl import read_cache, read_documents

    docs = read_documents(out)
    assert docs.num_rows > 0 and docs.column_names == ["doc_id", "spans"]
    cache = read_cache(out)
    assert cache.num_rows > 0 and "payload" in cache.column_names

    r = run("locate", "http://h0.example.org/r/0", "--out", out)
    assert r.returncode == 0, r.stderr[-500:]
    assert "state=" in r.stdout

    r = run("export", "--out", out)
    assert r.returncode == 0, r.stderr[-500:]
    assert "ACCEPTED rows" in r.stdout


def test_cli_query(tmp_path):
    """`query` subcommand: --list, head print, table write, dataset write."""
    env = dict(os.environ, PYTHONPATH=REPO, RAY_GRAFT_CPUS="4")

    def run(*args):
        return subprocess.run(
            [sys.executable, "-m", "anansi_ray.cli", "query", *args],
            env=env,
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=400,
        )

    r = run("--list")
    assert r.returncode == 0
    names = r.stdout.split()
    assert "lineitem_corr" in names and len(names) >= 150

    r = run("nope", "--sf-dir", "/root/testdata/sf0.001")
    assert r.returncode == 1 and "unknown query" in r.stderr

    r = run("lineitem_corr", "--sf-dir", "/root/testdata/sf0.001")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "l_discount" in r.stdout

    dest = str(tmp_path / "corr.parquet")
    r = run("lineitem_corr", "--sf-dir", "/root/testdata/sf0.001", "--out", dest)
    assert r.returncode == 0, r.stderr[-2000:]
    assert pq.read_table(dest).num_rows == 3

    ddir = str(tmp_path / "tc")
    r = run("token_count", "--sf-dir", "/root/testdata/sf0.001", "--out", ddir)
    assert r.returncode == 0, r.stderr[-2000:]
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(ddir)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert sum(pq.read_metadata(f).num_rows for f in files) == 500
