"""Storage layer: two-function interface with Lance-or-Parquet backends
and scheme-dispatched filesystems.

SURVEY §7: `pylance` is not installed in this environment, so the engine
keeps every table behind ``write_table`` / ``read_table`` with an identical
directory + manifest layout for both formats; installing ``pylance`` flips
the default backend without touching any pipeline code.

URI schemes dispatch to a ``pyarrow.fs`` filesystem (``file://`` locally,
``s3://`` where credentials exist) — the engine twin of the reference's
scheme→cache-backend dispatch (/root/reference/libcrawl/cache.c:209-229,
disk vs S3 vtables disk.c / s3.c).  There is no S3 endpoint in this
sandbox; tests/test_storage_uri.py exercises the dispatch structurally
through ``file://`` (and Ray's ``local://``) so the remote path is the
same code, not a claim.
"""

from __future__ import annotations

import os
import posixpath

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance not present in this environment
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False

DEFAULT_FORMAT = "lance" if HAVE_LANCE else "parquet"


def resolve_uri(path: str):
    """URI → (pyarrow FileSystem or None, concrete path).

    Plain paths stay on the local OS filesystem (None); anything with a
    scheme resolves via ``pyarrow.fs.FileSystem.from_uri`` — the
    scheme→backend dispatch point (cache.c:209-229)."""
    if "://" in path:
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(path)
        return filesystem, p
    return None, path


def write_table(tbl: pa.Table, path: str, fmt: str | None = None) -> str:
    """Write ``tbl`` to ``path`` (extension appended by format); returns the
    concrete path written (scheme stripped for URI destinations)."""
    fmt = fmt or DEFAULT_FORMAT
    filesystem, p = resolve_uri(path)
    if fmt == "lance" and filesystem is None:  # pragma: no cover
        dest = p if p.endswith(".lance") else p + ".lance"
        lance.write_dataset(tbl, dest, mode="overwrite")
        return dest
    dest = p if p.endswith(".parquet") else p + ".parquet"
    if filesystem is None:
        os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
        pq.write_table(tbl, dest)
    else:
        parent = posixpath.dirname(dest)
        if parent:
            filesystem.create_dir(parent, recursive=True)
        pq.write_table(tbl, dest, filesystem=filesystem)
    return dest


def read_table(path: str, columns: list[str] | None = None) -> pa.Table:
    """Read a table previously written by :func:`write_table` (either
    format, resolved by extension probe)."""
    filesystem, p = resolve_uri(path)
    if filesystem is not None:
        from pyarrow.fs import FileType

        for cand in (p, p + ".parquet"):
            if filesystem.get_file_info(cand).type == FileType.File:
                return pq.read_table(cand, columns=columns, filesystem=filesystem)
        raise FileNotFoundError(path)
    for cand, fmt in ((p, None), (p + ".lance", "lance"), (p + ".parquet", "parquet")):
        if os.path.exists(cand):
            if cand.endswith(".lance"):  # pragma: no cover
                return lance.dataset(cand).to_table(columns=columns)
            return pq.read_table(cand, columns=columns)
    raise FileNotFoundError(path)
