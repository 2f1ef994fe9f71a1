"""User-extension registries (SURVEY.md §2.11).

The reference exposes name-keyed registries for policies and processors:
``spider_set_processor_name("rdf"|"lod")`` resolves through the processor
registry (/root/reference/libspider/processor.c:40-67) and
``spider_add_policy("schemes"|"content-types")`` through the policy registry
(policy.c:36-63), with at most SPIDER_MAX_POLICIES = 8 policies chained per
spider (p_libspider.h:41).  Policy evaluation walks the chain in
registration order and the first non-ACCEPTED verdict wins, both for the
pre-fetch URI hook (policy.c:94-103) and the mid-fetch checkpoint hook
(policy.c:105-118).

This module is the Ray-engine equivalent: policies/processors register by
name; ``CrawlConfig.policies`` / ``CrawlConfig.processor_name`` select them
per crawl; ``process_fetch`` resolves the chain here instead of hard-coding
calls — a custom policy/processor plugs in without touching engine code
(see tests/test_registry.py).

A policy object provides two optional hooks, mirroring SPIDERPOLICY
(libspider.h:171-178):

* ``uri(url, cfg, ctx) -> CrawlState | None`` — pre-fetch; ``ctx`` carries
  engine-supplied per-row context (currently ``robots_disallow``).
* ``checkpoint(status, content_type, cfg) -> (CrawlState | None, status)``
  — after headers; may override the status (e.g. the 406 synthesis).

A processor provides ``process(payload, url, content_type, link_values,
content_location, cfg) -> (CrawlState, out_links, spans)`` — the
post-commit payload handler (libspider.h:156-162).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from anansi_ray.model import CrawlConfig, CrawlState

#: SPIDER_MAX_POLICIES (p_libspider.h:41)
MAX_POLICIES = 8


@dataclass(frozen=True)
class Policy:
    name: str
    uri: Callable | None = None
    checkpoint: Callable | None = None


_POLICIES: dict[str, Policy] = {}
_PROCESSORS: dict[str, Callable] = {}
#: bumped on every (un)registration; keys the chain-resolution cache so a
#: per-row hot path pays a dict hit, not a chain rebuild
_VERSION = 0
_CHAIN_CACHE: dict = {}


def register_policy(
    name: str, uri: Callable | None = None, checkpoint: Callable | None = None
) -> Policy:
    """Register (or replace) a named policy; returns the Policy object."""
    global _VERSION
    pol = Policy(name=name, uri=uri, checkpoint=checkpoint)
    _POLICIES[name] = pol
    _VERSION += 1
    _CHAIN_CACHE.clear()
    return pol


def unregister_policy(name: str) -> None:
    global _VERSION
    _POLICIES.pop(name, None)
    _VERSION += 1
    _CHAIN_CACHE.clear()


def register_processor(name: str, fn: Callable) -> Callable:
    _PROCESSORS[name] = fn
    return fn


def policy_chain(cfg: CrawlConfig) -> list[Policy]:
    """Resolve the config's ordered policy-name chain (≤ MAX_POLICIES);
    cached per (names, registry version).

    Names resolve against config-local objects FIRST
    (``cfg.extra["policy_objects"]: {name: Policy}``), then the process
    registry.  Config-local policies matter for distribution: the config is
    cloudpickled into every fetch task, so their callables reach Ray
    workers that never ran the driver's ``register_policy`` calls."""
    names = tuple(cfg.policies)
    local = cfg.extra.get("policy_objects") if cfg.extra else None
    if not local:
        cached = _CHAIN_CACHE.get(names)
        if cached is not None:
            return cached
    if len(names) > MAX_POLICIES:
        raise ValueError(
            f"policy chain length {len(names)} exceeds MAX_POLICIES={MAX_POLICIES} "
            "(p_libspider.h:41)"
        )
    chain = []
    for n in names:
        pol = (local or {}).get(n) or _POLICIES.get(n)
        if pol is None:
            raise KeyError(
                f"unknown policy {n!r}; registered: {sorted(_POLICIES)}"
                + (f" + config-local {sorted(local)}" if local else "")
            )
        chain.append(pol)
    if not local:
        _CHAIN_CACHE[names] = chain
    return chain


def apply_uri_policies(url: str, cfg: CrawlConfig, ctx: dict) -> CrawlState | None:
    """Walk the chain's pre-fetch hooks; first non-None verdict wins
    (policy.c:94-103 stops at the first non-ACCEPTED)."""
    for pol in policy_chain(cfg):
        if pol.uri is None:
            continue
        st = pol.uri(url, cfg, ctx)
        if st is not None:
            return st
    return None


def apply_checkpoint_policies(
    status: int, content_type: str | None, cfg: CrawlConfig
) -> tuple[CrawlState | None, int]:
    """Walk the chain's checkpoint hooks; first non-None verdict wins
    (policy.c:105-118)."""
    for pol in policy_chain(cfg):
        if pol.checkpoint is None:
            continue
        st, status = pol.checkpoint(status, content_type, cfg)
        if st is not None:
            return st, status
    return None, status


def get_processor(cfg: CrawlConfig) -> Callable:
    """Resolve the configured processor (processor.c:40-67 name lookup).

    The empty name auto-selects like crawld's config default: ``lod`` when
    the license filter is enabled, plain ``rdf`` otherwise.
    """
    name = cfg.processor_name or ("lod" if cfg.license_filter_enabled else "rdf")
    local = cfg.extra.get("processor_objects") if cfg.extra else None
    proc = (local or {}).get(name) or _PROCESSORS.get(name)
    if proc is None:
        raise KeyError(
            f"unknown processor {name!r}; registered: {sorted(_PROCESSORS)}"
            + (f" + config-local {sorted(local)}" if local else "")
        )
    return proc


# ---------------------------------------------------------------------------
# Built-ins — the reference's "schemes" / "content-types" policies
# (schemes.c, content-types.c), the engine's robots extension, and the
# "rdf" / "lod" processors (processors/rdf.c, processors/lod.c)
# ---------------------------------------------------------------------------


def _register_builtins() -> None:
    from anansi_ray.stages import policies as P
    from anansi_ray.stages import processors as PR

    register_policy(
        "schemes", uri=lambda url, cfg, ctx: P.scheme_policy(url, cfg)
    )
    register_policy(
        "robots",
        uri=lambda url, cfg, ctx: P.robots_policy(
            url, ctx.get("robots_disallow"), cfg
        ),
    )
    register_policy(
        "content-types",
        checkpoint=lambda status, ct, cfg: P.content_type_checkpoint(status, ct, cfg),
    )
    # F8 — the crawl-mirror example's prefix policy (crawl-mirror.c:119-139):
    # only http/https URLs string-prefixed by one of cfg.mirror_prefixes
    # proceed; everything else is SKIPPED.  Inert unless prefixes are set.
    register_policy("mirror-prefix", uri=lambda url, cfg, ctx: P.mirror_prefix_policy(url, cfg))
    register_processor("rdf", PR.process_rdf)
    register_processor("lod", PR.process_lod)
    register_processor("html", PR.process_html)  # M14 (crawl-mirror.c:265-291)


_register_builtins()
