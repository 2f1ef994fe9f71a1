"""URL canonicalization and cache-key derivation (operators M1-M4).

These functions define *identity* for the whole engine — dedup, sharding and
cache addressing all hang off the cache key — so every later stage depends on
bit-equality here.

Reference semantics reimplemented from scratch:

* fragment strip before hashing/storing — /root/reference/libcrawl/cache.c:114-118,
  libspider/queues/db.c:806-810
* cache key = SHA-256 over the canonical URI string, truncated to the first
  16 bytes, hex-encoded (32 hex chars) — cache.c:103-129
* ``shorthash`` = first 8 hex chars as uint32 — db.c:836-838;
  ``tinyhash`` = shorthash % 256 — db.c:1252
* root derivation: resolve "/" against the resource URI and key it —
  db.c:840-854
* RFC 3986 normalization (lowercase scheme/host, default-port strip,
  dot-segment removal, percent-encoding normalization) mirrors what liburi's
  parse + re-serialize does in ``db_uristr_key_root`` (db.c:794-866).

Batch entry points return dicts of numpy arrays so they can be used directly
inside ``ray.data.Dataset.map_batches``.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urlsplit, urljoin

import numpy as np

DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*$")

#: absolute URL with a NON-EMPTY authority: base resolution is a no-op for
#: these (RFC 3986 §5.2.2 — the reference's relative-ref handling agrees),
#: so canonicalize skips urljoin and canon_batch memoizes on the URL alone.
#: Anchored at the start so a "://"" inside a relative ref's query string
#: does not match; the [^/] guard keeps empty-authority forms on the slow
#: path (urljoin would splice the base's netloc into those).
_ABS_URL_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]")


def _pct_normalize(s: str) -> str:
    """Uppercase percent-escape hex digits; decode escapes of unreserved chars."""
    if "%" not in s:
        return s

    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    if not path:
        return path
    output: list[str] = []
    # operate on "/"-split segments; leading slash preserved by sentinel
    absolute = path.startswith("/")
    segs = path.split("/")
    if absolute:
        segs = segs[1:]
    for i, seg in enumerate(segs):
        last = i == len(segs) - 1
        if seg == ".":
            if last:
                output.append("")
        elif seg == "..":
            if output:
                output.pop()
            if last:
                output.append("")
        else:
            output.append(seg)
    out = "/".join(output)
    return ("/" + out) if absolute else out


def canonicalize(url: str, base: str | None = None) -> str | None:
    """Canonical absolute URI (fragment-stripped) or None if unusable.

    Mirrors M1+M2: parse (resolving against ``base`` when relative),
    normalize, re-serialize, drop ``#fragment``.
    """
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    if base and not _ABS_URL_RE.match(url):
        # absolute URLs (scheme + non-empty authority) resolve to
        # themselves under ANY base — skipping urljoin keeps components
        # identical and lets the batch memo key on the URL alone
        url = urljoin(base, url)
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if not scheme or not _SCHEME_RE.match(scheme):
        return None
    if not parts.netloc:
        if url[len(parts.scheme) + 1 :].startswith("//"):
            return None  # "http://" with empty authority
        # opaque (mailto:, urn:) — keep as-is minus fragment
        s = url.split("#", 1)[0]
        return s or None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if parts.username is not None:
        userinfo = parts.username + (
            ":" + parts.password if parts.password is not None else ""
        )
        netloc = userinfo + "@" + netloc
    if port is not None and port != DEFAULT_PORTS.get(scheme):
        netloc += f":{port}"
    path = _pct_normalize(remove_dot_segments(parts.path))
    if not path:
        path = "/"
    out = f"{scheme}://{netloc}{path}"
    if parts.query:
        out += "?" + _pct_normalize(parts.query)
    return out


def strip_fragment(url: str) -> str:
    """M2 — drop ``#fragment`` (cache.c:114-118)."""
    return url.split("#", 1)[0]


def cache_key(canonical_url: str) -> str:
    """M3 — truncated SHA-256 cache key, 32 hex chars (cache.c:103-129)."""
    return hashlib.sha256(strip_fragment(canonical_url).encode("utf-8")).hexdigest()[:32]


def shorthash(key: str) -> int:
    """First 8 hex chars of the cache key as uint32 (db.c:836-838)."""
    return int(key[:8], 16)


def tinyhash(key: str) -> int:
    """shorthash % 256 — the work-partitioning key (db.c:1252)."""
    return shorthash(key) % 256


def root_of(canonical_url: str) -> tuple[str, str, str]:
    """M4 — (root_url, root_hash, host): resolve "/" against the URI
    (db.c:840-854).
    """
    parts = urlsplit(canonical_url)
    host = (parts.hostname or "").lower()
    netloc = host
    try:
        port = parts.port
    except ValueError:
        port = None
    if port is not None and port != DEFAULT_PORTS.get(parts.scheme.lower()):
        netloc += f":{port}"
    root_url = f"{parts.scheme.lower()}://{netloc}/"
    return root_url, cache_key(root_url), host


# ---------------------------------------------------------------------------
# Batch (map_batches-ready) kernels
# ---------------------------------------------------------------------------


#: per-process (url, base) → canon-tuple memo; bounded so a pathological
#: URL stream cannot grow a worker heap
_CANON_MEMO: dict[tuple, tuple] = {}
_CANON_MEMO_MAX = 500_000


def canon_batch(urls, bases=None) -> dict[str, np.ndarray]:
    """Vectorized-at-the-batch-level canonicalize+hash kernel.

    Returns equal-length arrays ``url, url_hash, shorthash, tinyhash, host,
    root_hash, valid``.  Invalid rows get empty strings and valid=False.
    Per-row work is a tight Python loop over C-accelerated primitives
    (urlsplit + hashlib); a bounded PER-PROCESS memo amortizes repeated
    (url, base) pairs across batches and rounds — crawl link graphs repeat
    hub links on nearly every fetched page, so cross-round hits dominate.
    """
    n = len(urls)
    out_url = np.empty(n, dtype=object)
    out_hash = np.empty(n, dtype=object)
    out_short = np.zeros(n, dtype=np.uint32)
    out_tiny = np.zeros(n, dtype=np.uint8)
    out_host = np.empty(n, dtype=object)
    out_root = np.empty(n, dtype=object)
    out_valid = np.zeros(n, dtype=bool)
    memo = _CANON_MEMO
    if len(memo) > _CANON_MEMO_MAX:
        memo.clear()
    for i in range(n):
        u = urls[i]
        b = bases[i] if bases is not None else None
        # absolute candidates (the hub links that repeat on nearly every
        # page) key on the URL alone — one memo entry per distinct link
        # instead of one per (link, referring page)
        if b is not None and isinstance(u, str) and _ABS_URL_RE.match(u):
            b = None
        k = (u, b)
        hit = memo.get(k)
        if hit is None:
            c = canonicalize(u, b)
            if c is None or "://" not in c:
                hit = ("", "", 0, 0, "", "", False)
            else:
                h = cache_key(c)
                sh = shorthash(h)
                _, rh, host = root_of(c)
                hit = (c, h, sh, sh % 256, host, rh, True)
            memo[k] = hit
        (
            out_url[i],
            out_hash[i],
            out_short[i],
            out_tiny[i],
            out_host[i],
            out_root[i],
            out_valid[i],
        ) = hit
    return {
        "url": out_url,
        "url_hash": out_hash,
        "shorthash": out_short,
        "tinyhash": out_tiny,
        "host": out_host,
        "root_hash": out_root,
        "valid": out_valid,
    }


def normalize_content_type(ct: str | None) -> str:
    """M9 — strip ``;charset=…`` params + surrounding whitespace, lowercase
    (content-types.c:170-190, rdf.c:182-197).
    """
    if not ct:
        return ""
    return ct.split(";", 1)[0].strip().lower()
