"""Policy predicates (F1-F8): scheme / content-type / LOD license / robots.

Reference behavior reimplemented from scratch:

* scheme policy — whitelist miss ⇒ SKIPPED, blacklist hit ⇒ REJECTED,
  case-insensitive (/root/reference/libspider/policies/schemes.c:133-170)
* content-type checkpoint — runs after headers: 3xx ⇒ SKIPPED_COMMIT (kept
  for redirect following); whitelist/blacklist on the *normalized* media
  type, failure ⇒ synthesized status 406 + SKIPPED/REJECTED
  (policies/content-types.c:155-226)
* LOD license filter — document REJECTED unless a whitelisted license triple
  is asserted on the doc URI or its content-location
  (processors/lod.c:57-231)
* robots.txt path-prefix disallow — engine extension plugged in at the
  reference's pre-fetch URI-policy hook (libcrawl.h:112-115, fetch.c:97-109);
  the reference itself has no robots handling.

All pure functions over plain values so both the distributed pipeline and
the single-threaded oracle call the exact same policy kernel.
"""

from __future__ import annotations

from urllib.parse import urlsplit

from anansi_ray.canon import normalize_content_type
from anansi_ray.model import CrawlConfig, CrawlState


def scheme_policy(url: str, cfg: CrawlConfig) -> CrawlState | None:
    """F1 — returns a terminal state, or None to continue.

    Whitelist is evaluated BEFORE blacklist (schemes.c:141-168): a scheme
    that is blacklisted but also missing from a non-empty whitelist yields
    SKIPPED, not REJECTED.
    """
    scheme = url.split(":", 1)[0].lower()
    if cfg.scheme_whitelist and scheme not in (s.lower() for s in cfg.scheme_whitelist):
        return CrawlState.SKIPPED
    if scheme in (s.lower() for s in cfg.scheme_blacklist):
        return CrawlState.REJECTED
    return None


def robots_policy(url: str, disallow_prefixes, cfg: CrawlConfig) -> CrawlState | None:
    """Engine extension (F4 hook): path-prefix disallow ⇒ REJECTED."""
    if not cfg.respect_robots or not disallow_prefixes:
        return None
    path = urlsplit(url).path or "/"
    for prefix in disallow_prefixes:
        if prefix and path.startswith(prefix):
            return CrawlState.REJECTED
    return None


def content_type_checkpoint(
    status: int, content_type: str | None, cfg: CrawlConfig
) -> tuple[CrawlState | None, int]:
    """F2 — returns (terminal state or None, possibly-overridden status).

    3xx ⇒ SKIPPED_COMMIT (redirect kept, body not processed); whitelist miss
    ⇒ (SKIPPED, 406); blacklist hit ⇒ (REJECTED, 406).  Whitelist is
    evaluated BEFORE blacklist (content-types.c:191-224).  Deliberate
    deviation: the reference's ``n = c`` bookkeeping makes a whitelist
    match at index 0 count as a miss (content-types.c:196-203); we treat
    any whitelist match as a pass.
    """
    if 300 <= status < 400:
        return CrawlState.SKIPPED_COMMIT, status
    ct = normalize_content_type(content_type)
    if cfg.content_type_whitelist and ct not in (
        t.lower() for t in cfg.content_type_whitelist
    ):
        return CrawlState.SKIPPED, 406
    if ct and ct in (t.lower() for t in cfg.content_type_blacklist):
        return CrawlState.REJECTED, 406
    return None, status


def mirror_prefix_policy(url: str, cfg: CrawlConfig) -> CrawlState | None:
    """F8 — the crawl-mirror example's root-prefix gate
    (utils/crawl-mirror.c:119-139): http/https only, and the URL must be
    string-prefixed by one of ``cfg.mirror_prefixes``.  No-op when no
    prefixes are configured."""
    if not cfg.mirror_prefixes:
        return None
    scheme = url.split(":", 1)[0].lower()
    if scheme not in ("http", "https"):
        return CrawlState.SKIPPED
    for prefix in cfg.mirror_prefixes:
        if url.startswith(prefix):
            return None
    return CrawlState.SKIPPED


def license_policy(license_uris, cfg: CrawlConfig) -> bool:
    """F7 — True iff the document passes the LOD license filter."""
    if not cfg.license_filter_enabled:
        return True
    black = set(l.lower() for l in cfg.license_blacklist)
    white = set(l.lower() for l in cfg.license_whitelist)
    for lic in license_uris or ():
        l = lic.lower()
        if l in black:
            continue
        if not white or l in white:
            return True
    return False
