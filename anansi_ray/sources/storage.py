"""Storage layer: two-function interface with Lance-or-Parquet backends.

SURVEY §7: `pylance` is not installed in this environment, so the engine
keeps every table behind ``write_table`` / ``read_table`` with an identical
directory + manifest layout for both formats; installing ``pylance`` flips
the default backend without touching any pipeline code.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance not present in this environment
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False

DEFAULT_FORMAT = "lance" if HAVE_LANCE else "parquet"


def write_table(tbl: pa.Table, path: str, fmt: str | None = None) -> str:
    """Write ``tbl`` to ``path`` (extension appended by format); returns the
    concrete path written."""
    fmt = fmt or DEFAULT_FORMAT
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if fmt == "lance":  # pragma: no cover
        dest = path if path.endswith(".lance") else path + ".lance"
        lance.write_dataset(tbl, dest, mode="overwrite")
        return dest
    dest = path if path.endswith(".parquet") else path + ".parquet"
    pq.write_table(tbl, dest)
    return dest


def read_table(path: str, columns: list[str] | None = None) -> pa.Table:
    """Read a table previously written by :func:`write_table` (either
    format, resolved by extension probe)."""
    for cand, fmt in ((path, None), (path + ".lance", "lance"), (path + ".parquet", "parquet")):
        if os.path.exists(cand):
            if cand.endswith(".lance"):  # pragma: no cover
                return lance.dataset(cand).to_table(columns=columns)
            return pq.read_table(cand, columns=columns)
    raise FileNotFoundError(path)
