"""Multi-format ingestion: CSV/JSONL/parquet all land on DOC_SCHEMA and the
format never changes downstream results."""
from __future__ import annotations

import csv
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anansi_ray.sources.ingest import (
    DOC_SCHEMA,
    normalize_documents_batch,
    read_documents,
    write_documents,
)

ROWS = [
    {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"},
    {"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web"},
    {"doc_id": 3, "text": "", "lang": "", "source": "dump"},
]


def _write_inputs(tmp_path):
    paths = {}
    t = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in ROWS], pa.int64()),
            "text": [r["text"] for r in ROWS],
            "lang": [r["lang"] for r in ROWS],
            "source": [r["source"] for r in ROWS],
        }
    )
    paths["parquet"] = str(tmp_path / "docs.parquet")
    pq.write_table(t, paths["parquet"])
    paths["csv"] = str(tmp_path / "docs.csv")
    with open(paths["csv"], "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["doc_id", "text", "lang", "source"])
        w.writeheader()
        w.writerows(ROWS)
    paths["jsonl"] = str(tmp_path / "docs.jsonl")
    with open(paths["jsonl"], "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    return paths


@pytest.mark.usefixtures("ray_session")
class TestReadDocuments:
    def test_all_formats_agree(self, tmp_path):
        paths = _write_inputs(tmp_path)
        results = {}
        for fmt, p in paths.items():
            tbl = (
                read_documents(p)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            results[fmt] = tbl
        base = results["parquet"]
        assert list(base.columns) == [f.name for f in DOC_SCHEMA]
        assert base["n_chars"].tolist() == [11, 7, 0]
        for fmt in ("csv", "jsonl"):
            got = results[fmt]
            # CSV can't distinguish ""/null; normalizer folds null → ""
            assert got["doc_id"].tolist() == base["doc_id"].tolist()
            assert got["text"].tolist() == base["text"].tolist()
            assert got["n_chars"].tolist() == base["n_chars"].tolist()

    def test_roundtrip_write(self, tmp_path):
        paths = _write_inputs(tmp_path)
        ds = read_documents(paths["parquet"])
        out = str(tmp_path / "out_json")
        write_documents(ds, out, format="json")
        back = (
            read_documents(out, format="json")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert back["doc_id"].tolist() == [1, 2, 3]
        assert back["text"].tolist() == ["hello world", "bonjour", ""]


class TestNormalizer:
    def test_derives_missing_columns(self):
        b = pa.table({"text": ["abc", "de"]})
        out = normalize_documents_batch(b)
        assert out.schema.names == [f.name for f in DOC_SCHEMA]
        assert out["n_chars"].to_pylist() == [3, 2]
        assert out["lang"].to_pylist() == ["", ""]
        # derived ids are deterministic and distinct
        again = normalize_documents_batch(b)
        assert out["doc_id"].to_pylist() == again["doc_id"].to_pylist()
        assert len(set(out["doc_id"].to_pylist())) == 2
        assert all(i >= 0 for i in out["doc_id"].to_pylist())

    def test_existing_columns_pass_through(self):
        b = pa.table(
            {
                "doc_id": pa.array([7], pa.int32()),
                "text": ["x"],
                "lang": ["en"],
                "source": ["s"],
                "n_chars": pa.array([1], pa.int32()),
            }
        )
        out = normalize_documents_batch(b)
        assert out["doc_id"].type == pa.int64()
        assert out["doc_id"].to_pylist() == [7]
        assert out["n_chars"].to_pylist() == [1]
