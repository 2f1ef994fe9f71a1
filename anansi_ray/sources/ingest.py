"""Multi-format document ingestion → the canonical ``documents`` schema.

A training-data pipeline rarely starts from tidy parquet: crawl dumps come
as JSONL, spreadsheets as CSV.  ``read_documents`` reads any of the three
into a Dataset with the canonical schema (doc_id int64, text string, lang
string, source string, n_chars int64), deriving missing columns
deterministically:

- ``doc_id`` missing → a stable 63-bit fingerprint of (source, text) via
  the same sha-prefix rule as the URL cache key (NOT the row index — a row
  index needs a global ordering pass, which doesn't exist at 100 TB).
- ``n_chars`` missing → ``utf8_length(text)``.
- ``lang`` / ``source`` missing → ``""`` (unknown).

Reads are Ray-Data-native (`read_parquet` / `read_csv` / `read_json`), so
format never changes the execution shape: files split into blocks, the
normalizer is one vectorized ``map_batches``, and everything downstream is
format-agnostic.  ``write_documents`` is the sink twin (parquet/jsonl/csv,
partitioned dirs — resumable output contract).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)

_FORMATS = {"parquet", "csv", "json"}


def _infer_format(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lower().lstrip(".")
    if ext in ("jsonl", "ndjson"):
        return "json"
    if ext in _FORMATS:
        return ext
    # directories: sniff the first file
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            sub = os.path.splitext(name)[1].lower().lstrip(".")
            if sub in ("jsonl", "ndjson"):
                return "json"
            if sub in _FORMATS:
                return sub
    raise ValueError(f"cannot infer format for {path!r}; pass format=")


def _stable_doc_id(source, text) -> pa.Array:
    """63-bit deterministic id from (source, text) — first 16 hex chars of
    sha256, masked positive (same truncated-sha shape as canon.cache_key,
    cache.c:103-129)."""
    ids = [
        int.from_bytes(
            hashlib.sha256(f"{s}\x00{t}".encode()).digest()[:8], "big"
        )
        & 0x7FFFFFFFFFFFFFFF
        for s, t in zip(source.to_pylist(), text.to_pylist())
    ]
    return pa.array(ids, pa.int64())


def normalize_documents_batch(batch: pa.Table) -> pa.Table:
    """Vectorized schema normalizer: derive/cast to DOC_SCHEMA."""
    n = batch.num_rows
    names = set(batch.schema.names)
    text = (
        pc.fill_null(batch["text"].cast(pa.string()), "")
        if "text" in names
        else pa.array([""] * n, pa.string())
    )
    lang = (
        pc.fill_null(batch["lang"].cast(pa.string()), "")
        if "lang" in names
        else pa.array([""] * n, pa.string())
    )
    source = (
        pc.fill_null(batch["source"].cast(pa.string()), "")
        if "source" in names
        else pa.array([""] * n, pa.string())
    )
    if "doc_id" in names:
        doc_id = batch["doc_id"].cast(pa.int64())
    else:
        doc_id = _stable_doc_id(source, text)
    if "n_chars" in names:
        n_chars = batch["n_chars"].cast(pa.int64())
    else:
        n_chars = pc.utf8_length(text).cast(pa.int64())
    return pa.table(
        {
            "doc_id": doc_id,
            "text": text,
            "lang": lang,
            "source": source,
            "n_chars": n_chars,
        }
    )


def read_documents(path: str, format: str | None = None, **read_kwargs) -> rd.Dataset:
    """Read documents from parquet / CSV / JSONL into the canonical schema."""
    fmt = format or _infer_format(path)
    if fmt == "parquet":
        ds = rd.read_parquet(path, **read_kwargs)
    elif fmt == "csv":
        ds = rd.read_csv(path, **read_kwargs)
    elif fmt == "json":
        ds = rd.read_json(path, **read_kwargs)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    return ds.map_batches(normalize_documents_batch, batch_format="pyarrow")


def write_documents(ds: rd.Dataset, out_dir: str, format: str = "parquet") -> str:
    """Sink twin: partitioned multi-file output (resumable contract — each
    block becomes its own file, so a re-run can diff/skip)."""
    if format == "parquet":
        ds.write_parquet(out_dir)
    elif format == "json":
        ds.write_json(out_dir)
    elif format == "csv":
        ds.write_csv(out_dir)
    else:
        raise ValueError(f"unsupported format {format!r}")
    return out_dir
