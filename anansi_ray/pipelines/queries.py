"""Driver-contract query registry: every implemented operator/pipeline from
SURVEY.md §2 (plus the training-data extensions) as a callable over a
``sf_dir`` of parquet tables, paired — where SQL-expressible — with a DuckDB
oracle computing the identical definition.

Column names and rounding are pinned IDENTICALLY on both sides (the driver
hash-compares values after sorting columns by name).  Float aggregates are
rounded on both sides to make the comparison independent of summation
order.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from anansi_ray.arrowds import install_stable_to_pandas, ts_us
from anansi_ray.canon import canon_batch, normalize_content_type
from anansi_ray.functions import dedup as fdedup
from anansi_ray.functions import events as fevents
from anansi_ray.functions import multimodal as fmedia
from anansi_ray.functions import similarity as fsim
from anansi_ray.functions import text as ftext
from anansi_ray.model import CrawlConfig
from anansi_ray.stages.policies import scheme_policy

# every query finish funnels through Dataset.to_pandas — make it keep the
# declared column schema when the result is ALL-empty (see arrowds)
install_stable_to_pandas()


def _strip_meta(batch: pa.Table) -> pa.Table:
    """Drop schema-level metadata (the driver's parquet carries a b'pandas'
    entry): pa.Schema with metadata is unhashable, which defeats Ray's
    shuffle-reduce schema deduplication (transform_pyarrow.py warns
    'Failed to hash the schemas' and falls back to full unify per reduce).
    Zero-copy — only the schema object changes."""
    return batch.replace_schema_metadata(None)


def _read(sf_dir: str, name: str, columns=None) -> rd.Dataset:
    path = os.path.join(sf_dir, f"{name}.parquet")
    ds = rd.read_parquet(path, columns=columns)
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        # a directory of part files (multi-block fixtures)
        n_rows = sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        n_rows = pq.read_metadata(path).num_rows
    if n_rows == 0:
        # nothing to strip, and the bare read keeps its (parquet) schema —
        # a map_batches over an all-empty dataset would erase it (Ray
        # never runs UDFs on empty blocks), breaking every downstream
        # consumer that asks ds.schema()
        return ds
    return ds.map_batches(_strip_meta, batch_format="pyarrow")


def _stable(df, schema: dict):
    """Reinstate the declared output columns on an all-empty driver frame.

    Ray's ``map_batches``/``map_groups`` never invoke the UDF on an empty
    input block and emit a schema-LESS empty block instead (the streaming
    executor warns ``new schema: .``); a pipeline whose every row is
    filtered out therefore reaches the driver as a 0-column DataFrame and
    the finishing ``sort_values``/``groupby`` raises KeyError.  A no-op
    whenever any column survived; ``schema`` maps column name → pandas
    dtype string.  At scale some partition is ALWAYS empty, so every
    driver-side finish must tolerate this shape (tiny-input sweep)."""
    from anansi_ray.arrowds import stable_frame

    return stable_frame(df, schema)


def _stable_t(df, empty_tbl: pa.Table):
    """``_stable`` with the schema taken from the query's own typed empty
    Arrow table (the one its partition kernel already returns for empty
    groups)."""
    if len(df) == 0 and not set(empty_tbl.schema.names) <= set(df.columns):
        return empty_tbl.to_pandas()
    return df


def _with_schema(ds: rd.Dataset, empty_tbl: pa.Table) -> rd.Dataset:
    """Attach the declared output schema to a Dataset-returning query by
    unioning ONE typed 0-row block.

    On an all-empty input Ray cannot know a map chain's output schema
    (UDFs never run on empty blocks, so every block downstream of the
    read is schema-less and ``ds.schema()`` is None) — the sentinel block
    is the only carrier, making ``to_pandas``/downstream unions schema-
    stable while adding zero rows and one no-op input to the plan."""
    from anansi_ray.arrowds import from_arrow_local

    return ds.union(from_arrow_local([empty_tbl]))


def _empty_tbl(spec: dict) -> pa.Table:
    """Typed 0-row table from a {column: arrow type} spec (the sentinel
    argument for ``_with_schema``)."""
    return pa.table({c: pa.array([], t) for c, t in spec.items()})


# ---------------------------------------------------------------------------
# URL-kernel queries (M1-M4, M9, F1) — URLs synthesized deterministically
# from doc_id so the DuckDB oracle can derive the identical input.
# ---------------------------------------------------------------------------

URL_EXPR_SQL = (
    "'http://h' || (doc_id % 50) || '.example.org/doc/' || doc_id || "
    "(CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END)"
)


def _synth_urls(batch: pa.Table) -> list[str]:
    ids = batch["doc_id"].to_pylist()
    return [
        f"http://h{d % 50}.example.org/doc/{d}" + ("#frag" if d % 7 == 0 else "")
        for d in ids
    ]


def q_url_cache_key(sf_dir: str):
    """M1-M3: canonicalize + truncated-SHA-256 cache key + shorthash/tinyhash
    (cache.c:103-129, db.c:836-838, db.c:1252)."""

    def kernel(batch: pa.Table) -> pa.Table:
        urls = _synth_urls(batch)
        c = canon_batch(urls)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "url": pa.array(c["url"], pa.string()),
                "url_hash": pa.array(c["url_hash"], pa.string()),
                "shorthash": pa.array(c["shorthash"].astype(np.int64), pa.int64()),
                "tinyhash": pa.array(c["tinyhash"].astype(np.int64), pa.int64()),
            }
        )

    return _with_schema(
        _read(sf_dir, "documents", ["doc_id"]).map_batches(
            kernel, batch_format="pyarrow"
        ),
        _empty_tbl(
            {
                "doc_id": pa.int64(),
                "url": pa.string(),
                "url_hash": pa.string(),
                "shorthash": pa.int64(),
                "tinyhash": pa.int64(),
            }
        ),
    )


SQL_URL_CACHE_KEY = f"""
WITH u AS (SELECT doc_id, {URL_EXPR_SQL} AS raw_url FROM documents)
SELECT doc_id,
       split_part(raw_url, '#', 1) AS url,
       substr(sha256(split_part(raw_url, '#', 1)), 1, 32) AS url_hash,
       (('0x' || substr(sha256(split_part(raw_url, '#', 1)), 1, 8))::UBIGINT)::BIGINT AS shorthash,
       ((('0x' || substr(sha256(split_part(raw_url, '#', 1)), 1, 8))::UBIGINT) % 256)::BIGINT AS tinyhash
FROM u
"""


def q_url_root(sf_dir: str):
    """M4: host-root derivation (db.c:840-854)."""

    def kernel(batch: pa.Table) -> pa.Table:
        urls = _synth_urls(batch)
        c = canon_batch(urls)
        root_urls = [f"http://{h}/" for h in c["host"]]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "host": pa.array(c["host"], pa.string()),
                "root_url": pa.array(root_urls, pa.string()),
                "root_hash": pa.array(c["root_hash"], pa.string()),
            }
        )

    return _with_schema(
        _read(sf_dir, "documents", ["doc_id"]).map_batches(
            kernel, batch_format="pyarrow"
        ),
        _empty_tbl(
            {
                "doc_id": pa.int64(),
                "host": pa.string(),
                "root_url": pa.string(),
                "root_hash": pa.string(),
            }
        ),
    )


SQL_URL_ROOT = """
WITH u AS (SELECT doc_id, 'h' || (doc_id % 50) || '.example.org' AS host FROM documents)
SELECT doc_id, host,
       'http://' || host || '/' AS root_url,
       substr(sha256('http://' || host || '/'), 1, 32) AS root_hash
FROM u
"""


def q_content_type_normalize(sf_dir: str):
    """M9: media-type parameter stripping (content-types.c:170-190)."""
    cts = [
        "text/turtle",
        "application/rdf+xml; charset=utf-8",
        " Text/HTML ;q=0.9",
        "application/n-quads",
    ]

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        raw = [cts[d % 4] for d in ids]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "content_type": pa.array(raw, pa.string()),
                "normalized": pa.array(
                    [normalize_content_type(c) for c in raw], pa.string()
                ),
            }
        )

    return _with_schema(
        _read(sf_dir, "documents", ["doc_id"]).map_batches(
            kernel, batch_format="pyarrow"
        ),
        _empty_tbl(
            {
                "doc_id": pa.int64(),
                "content_type": pa.string(),
                "normalized": pa.string(),
            }
        ),
    )


SQL_CONTENT_TYPE = """
WITH u AS (SELECT doc_id,
    CASE doc_id % 4 WHEN 0 THEN 'text/turtle'
                    WHEN 1 THEN 'application/rdf+xml; charset=utf-8'
                    WHEN 2 THEN ' Text/HTML ;q=0.9'
                    ELSE 'application/n-quads' END AS content_type
  FROM documents)
SELECT doc_id, content_type,
       lower(trim(split_part(content_type, ';', 1))) AS normalized
FROM u
"""


def q_scheme_policy(sf_dir: str):
    """F1: scheme whitelist/blacklist policy (schemes.c:133-170) —
    whitelist first: mailto (not whitelisted) SKIPs before any blacklist
    look; javascript (whitelisted AND blacklisted) reaches the blacklist
    and REJECTs."""
    schemes = ["https", "http", "ftp", "mailto", "javascript"]
    cfg = CrawlConfig(
        scheme_whitelist=("https", "http", "ftp", "javascript"),
        scheme_blacklist=("javascript",),
    )

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        out_scheme, out_state = [], []
        for d in ids:
            s = schemes[d % 5]
            st = scheme_policy(f"{s}://x.example/p", cfg)
            out_scheme.append(s)
            out_state.append("PASS" if st is None else st.name)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "scheme": pa.array(out_scheme, pa.string()),
                "decision": pa.array(out_state, pa.string()),
            }
        )

    return _with_schema(
        _read(sf_dir, "documents", ["doc_id"]).map_batches(
            kernel, batch_format="pyarrow"
        ),
        _empty_tbl(
            {
                "doc_id": pa.int64(),
                "scheme": pa.string(),
                "decision": pa.string(),
            }
        ),
    )


SQL_SCHEME_POLICY = """
SELECT doc_id,
       CASE doc_id % 5 WHEN 0 THEN 'https' WHEN 1 THEN 'http' WHEN 2 THEN 'ftp'
                       WHEN 3 THEN 'mailto' ELSE 'javascript' END AS scheme,
       CASE CASE doc_id % 5 WHEN 0 THEN 'https' WHEN 1 THEN 'http' WHEN 2 THEN 'ftp'
                            WHEN 3 THEN 'mailto' ELSE 'javascript' END
            WHEN 'mailto' THEN 'SKIPPED'         -- whitelist miss, checked first
            WHEN 'javascript' THEN 'REJECTED'    -- whitelisted, then blacklisted
            ELSE 'PASS' END AS decision
FROM documents
"""


# ---------------------------------------------------------------------------
# Text-analysis / dedup queries
# ---------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    return _with_schema(
        fdedup.exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"])),
        _empty_tbl({"text_hash": pa.string(), "doc_id": pa.int64()}),
    )


SQL_DEDUP_EXACT = """
SELECT substr(sha256(text), 1, 32) AS text_hash, min(doc_id) AS doc_id
FROM documents GROUP BY 1
"""


def q_token_count(sf_dir: str):
    return _with_schema(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            ftext.token_count_batch, batch_format="pyarrow"
        ),
        _empty_tbl(
            {
                "doc_id": pa.int64(),
                "n_tokens_ws": pa.int64(),
                "n_tokens": pa.int64(),
            }
        ),
    )


SQL_TOKEN_COUNT = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens_ws,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]'))::BIGINT AS n_tokens
FROM documents
"""


def q_quality_score(sf_dir: str):
    return _with_schema(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            ftext.quality_score_batch, batch_format="pyarrow"
        ),
        _empty_tbl(
            {
                "doc_id": pa.int64(),
                "n_chars": pa.int64(),
                "punct_ratio": pa.float64(),
                "stopword_ratio": pa.float64(),
                "mean_word_len": pa.float64(),
            }
        ),
    )


SQL_QUALITY = r"""
WITH t AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct,
         string_split_regex(trim(text), '\s+') AS toks
  FROM documents)
SELECT doc_id,
       n_chars::BIGINT AS n_chars,
       round(n_punct / greatest(n_chars, 1), 6) AS punct_ratio,
       round(len(list_filter(toks, x -> x IN ('the','a','and','of','to','in')))
             / greatest(len(toks), 1), 6) AS stopword_ratio,
       round(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
             / greatest(len(toks), 1), 6) AS mean_word_len
FROM t
"""


def q_fingerprint(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        ftext.fingerprint_batch, batch_format="pyarrow"
    )
    return _with_schema(
        ds.select_columns(["doc_id", "fp_md5"]),
        _empty_tbl({"doc_id": pa.int64(), "fp_md5": pa.string()}),
    )


SQL_FINGERPRINT = r"""
SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp_md5
FROM documents
"""


def q_lang_id(sf_dir: str):
    return _with_schema(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            ftext.lang_id_batch, batch_format="pyarrow"
        ),
        _empty_tbl({"doc_id": pa.int64(), "lang_pred": pa.string()}),
    )


def _sql_lang_id() -> str:
    """CASE-ladder oracle for the stopword-count language ID: strictly-
    greater updates over alphabetical language order ⇒ the FIRST language
    attaining the max wins; all-zero ⇒ 'und'."""
    scores = ",\n       ".join(
        "len(list_filter(toks, x -> x IN ({}))) AS s_{}".format(
            ", ".join(f"'{w}'" for w in sorted(ftext.LANG_STOPWORDS[lang])), lang
        )
        for lang in ftext.LANG_ORDER
    )
    mx = "greatest({})".format(", ".join(f"s_{l}" for l in ftext.LANG_ORDER))
    ladder = "\n            ".join(
        f"WHEN s_{l} = mx THEN '{l}'" for l in ftext.LANG_ORDER[:-1]
    )
    return rf"""
WITH tk AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR text = '' THEN []::VARCHAR[]
              ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
  FROM documents),
sc AS (SELECT doc_id,
       {scores}
  FROM tk),
m AS (SELECT *, {mx} AS mx FROM sc)
SELECT doc_id,
       CASE WHEN mx = 0 THEN 'und'
            {ladder}
            ELSE '{ftext.LANG_ORDER[-1]}' END AS lang_pred
FROM m
"""


SQL_LANG_ID = _sql_lang_id()


#: shared CTE: per-doc 64-bit SimHash recomputed entirely in SQL — token
#: hash = first 8 bytes of sha256 (matching dedup.simhash64), bit
#: accumulation over range(64), value assembled with HUGEINT shifts
_SIMHASH_CTE = r"""
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '\w+')) AS t
  FROM documents),
hv AS (SELECT doc_id, ('0x' || substr(sha256(t), 1, 16))::UBIGINT AS h FROM tok),
bits AS (
  SELECT doc_id, i,
         CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END AS v
  FROM hv, range(64) r(i)),
acc AS (SELECT doc_id, i, sum(v) AS s FROM bits GROUP BY 1, 2),
sim AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (1::HUGEINT << i::INTEGER) ELSE 0::HUGEINT END) AS v
  FROM acc GROUP BY 1)
"""

SQL_SIMHASH = f"""
WITH {_SIMHASH_CTE}
SELECT d.doc_id,
       lpad(lower(to_hex(coalesce(sim.v, 0)::UBIGINT)), 16, '0') AS simhash
FROM documents d LEFT JOIN sim ON d.doc_id = sim.doc_id
"""

#: near-dup oracle replicates the SAME 4-piece pigeonhole bucketing the
#: Ray operator uses (candidates = docs sharing any 16-bit piece), then
#: exact hamming via bit_count(xor) — so the approximate semantics match
#: bit-for-bit, not just approximately
SQL_SIMHASH_NEAR_DUP = f"""
WITH {_SIMHASH_CTE},
v AS (
  SELECT d.doc_id, coalesce(sim.v, 0)::UBIGINT AS v
  FROM documents d LEFT JOIN sim ON d.doc_id = sim.doc_id),
p AS (
  SELECT doc_id, v, i AS piece, (v >> (16 * i)::INTEGER) & 65535 AS piece_val
  FROM v, range(4) r(i)),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.v AS va, r.v AS vb
  FROM p l JOIN p r
    ON l.piece = r.piece AND l.piece_val = r.piece_val AND l.doc_id < r.doc_id)
SELECT a, b, bit_count(xor(va, vb))::INTEGER AS hamming
FROM cand
WHERE bit_count(xor(va, vb)) <= 6
ORDER BY a, b
"""


#: per-sf memo of the materialized MinHash signature Dataset — computed once
#: and shared by minhash_near_dup and ngram_jaccard_pairs (the round-2
#: version recomputed the 128-perm pass per query)
_SIG_CACHE: dict[str, rd.Dataset] = {}


def _doc_signatures(sf_dir: str) -> rd.Dataset:
    sig = _SIG_CACHE.get(sf_dir)
    if sig is None:
        sig = fdedup.minhash_signatures(_read(sf_dir, "documents", ["doc_id", "text"]))
        _SIG_CACHE[sf_dir] = sig
    return sig


#: memoized df-stamped shingle table (threshold/sim-independent) shared by
#: the three exact set-similarity joins — one tokenize+exchange build per
#: sf instead of three
_SHINGLE_STAMPED_MEMO: dict[str, rd.Dataset] = {}


def _shingle_stamped_ds(sf_dir: str) -> rd.Dataset:
    ds = _SHINGLE_STAMPED_MEMO.get(sf_dir)
    if ds is None:
        ds = fdedup.shingle_stamped(
            _read(sf_dir, "documents", ["doc_id", "text"])
        )
        _SHINGLE_STAMPED_MEMO[sf_dir] = ds
    return ds


#: memoized MinHash-CC label Datasets (narrow (doc_id, dup_group) blocks in
#: the object store), shared by minhash_near_dup, dup_group_size_hist and
#: the curation composition — the propagation is deterministic per corpus,
#: so per-process reuse is exact (same pattern as _SIG_CACHE/_CRAWL_MEMO)
_CC_LABELS_MEMO: dict[str, rd.Dataset] = {}


def _minhash_cc_labels(sf_dir: str) -> rd.Dataset:
    ds = _CC_LABELS_MEMO.get(sf_dir)
    if ds is None:
        pairs = fdedup.minhash_candidate_pairs(
            sig_ds=_doc_signatures(sf_dir), min_jaccard=0.5
        )
        ds = fdedup.connected_components_labels(
            pairs, _read(sf_dir, "documents", ["doc_id"])
        ).materialize()
        _CC_LABELS_MEMO[sf_dir] = ds
    return ds


def q_minhash_near_dup(sf_dir: str):
    """MinHash-LSH near-dup groups, fully distributed: repartition-join
    signature verification + iterated min-label propagation — no driver
    dict / to_pandas anywhere in the path (labels memoized per process,
    see _minhash_cc_labels)."""
    tbl = fdedup._collect_sorted(_minhash_cc_labels(sf_dir), ["doc_id"])
    if tbl is None:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "dup_group": pa.array([], pa.int64()),
            }
        )
    return tbl


def q_simhash(sf_dir: str):
    return _with_schema(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            fdedup.simhash_batch, batch_format="pyarrow"
        ),
        _empty_tbl({"doc_id": pa.int64(), "simhash": pa.string()}),
    )


def q_simhash_near_dup(sf_dir: str):
    return fdedup.simhash_near_dup_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), max_hamming=6
    )


# ---------------------------------------------------------------------------
# Embedding queries
# ---------------------------------------------------------------------------

KNN_QUERIES = list(range(10))
KNN_K = 10
# synthetic embeddings peak at ~0.51 off-diagonal cosine; 0.45 keeps the
# "near-dup" predicate non-trivial on this data while exercising the exact
# threshold-pair machinery
NEAR_DUP_TAU = 0.45


def q_knn_cosine(sf_dir: str):
    return fsim.knn_brute(_read(sf_dir, "embeddings"), KNN_QUERIES, k=KNN_K)


SQL_KNN = f"""
WITH n AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS emb,
         sqrt(list_aggregate(list_transform(embedding, x -> (x::DOUBLE)*(x::DOUBLE)), 'sum')) AS nrm
  FROM embeddings),
sims AS (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         round(list_aggregate(list_transform(range(len(q.emb)),
               i -> q.emb[(i+1)::int] * e.emb[(i+1)::int]), 'sum')
               / greatest(q.nrm * e.nrm, 1e-12), 6) AS cosine
  FROM n q JOIN n e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < {len(KNN_QUERIES)}),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM sims)
SELECT query_id, rank::BIGINT AS rank, vec_id, cosine
FROM ranked WHERE rank <= {KNN_K}
ORDER BY query_id, rank
"""


def q_embedding_near_dup(sf_dir: str):
    return fdedup.embedding_near_dup_pairs(
        _read(sf_dir, "embeddings"), threshold=NEAR_DUP_TAU
    )


SQL_EMB_NEAR_DUP = f"""
WITH n AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS emb,
         sqrt(list_aggregate(list_transform(embedding, x -> (x::DOUBLE)*(x::DOUBLE)), 'sum')) AS nrm
  FROM embeddings)
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_aggregate(list_transform(range(len(a.emb)),
             i -> a.emb[(i+1)::int] * b.emb[(i+1)::int]), 'sum')
             / greatest(a.nrm * b.nrm, 1e-12), 6) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_aggregate(list_transform(range(len(a.emb)),
      i -> a.emb[(i+1)::int] * b.emb[(i+1)::int]), 'sum')
      / greatest(a.nrm * b.nrm, 1e-12) >= {NEAR_DUP_TAU}
ORDER BY a, b
"""


def q_embedding_near_dup_lsh(sf_dir: str):
    """LSH-bucketed near-dup (scale path; approximate vs the exact variant
    — recall tested in tests/test_dedup.py).  Bucketing is integer-exact
    (fdedup.lsh_bucket_sigs), so the single-threaded oracle twin
    reproduces the output value-exactly."""
    return fdedup.embedding_near_dup_lsh(
        _read(sf_dir, "embeddings"), threshold=NEAR_DUP_TAU
    )


def q_ngram_jaccard_pairs(sf_dir: str):
    """Exact token-3-gram Jaccard verification of the MinHash-LSH candidate
    pairs (the D-series near-dup verify primitive).  The texts join back to
    the pairs via the distributed repartition join on doc_id — never a
    driver-side {doc_id: text} dict.  The signature Dataset is the shared
    per-sf memo — no fresh 128-perm pass."""
    cand = fdedup.minhash_candidate_pairs(
        sig_ds=_doc_signatures(sf_dir), min_jaccard=0.3
    )
    joined = fdedup.attach_pair_values(
        rd.from_arrow(cand.select(["a", "b"])),
        _read(sf_dir, "documents", ["doc_id", "text"]),
        "doc_id",
        "text",
        pa.string(),
    )

    def verify(batch: pa.Table) -> pa.Table:
        jac = [
            round(fdedup.ngram_jaccard(ta, tb), 6)
            for ta, tb in zip(batch["val_a"].to_pylist(), batch["val_b"].to_pylist())
        ]
        return pa.table(
            {"a": batch["a"], "b": batch["b"], "jaccard": pa.array(jac, pa.float64())}
        )

    out = fdedup._collect_sorted(
        joined.map_batches(verify, batch_format="pyarrow"), ["a", "b"]
    )
    if out is None:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    return out


def q_knn_ivf(sf_dir: str):
    """IVF index searched with n_probe = n_cells (full probe ⇒ exact):
    the partition/assignment/pruned-scan machinery is verified value-exact
    against the same SQL as brute-force top-k; cell-PRUNED recall
    (n_probe < n_cells) is asserted in tests/test_similarity.py."""
    idx = fsim.IvfIndex(n_cells=8, n_iter=5, seed=42).build(_read(sf_dir, "embeddings"))
    return idx.search(KNN_QUERIES, k=KNN_K, n_probe=8)


# ---------------------------------------------------------------------------
# Event-stream queries (windowed aggregates)
# ---------------------------------------------------------------------------


def q_events_hourly(sf_dir: str):
    return _with_schema(
        fevents.tumbling_window(
            _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
        ),
        _empty_tbl(
            {
                "user_id": pa.int64(),
                "window_us": pa.int64(),
                "n_events": pa.int64(),
                "sum_value": pa.float64(),
            }
        ),
    )


SQL_EVENTS_HOURLY = """
SELECT user_id,
       (epoch_us(ts) // 3600000000) * 3600000000 AS window_us,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_sliding(sf_dir: str):
    return _with_schema(
        fevents.sliding_window(
            _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
        ),
        _empty_tbl(
            {
                "user_id": pa.int64(),
                "window_us": pa.int64(),
                "n_events": pa.int64(),
                "sum_value": pa.float64(),
            }
        ),
    )


SQL_EVENTS_SLIDING = """
SELECT user_id,
       ((epoch_us(ts) // 1800000000) - i) * 1800000000 AS window_us,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS sum_value
FROM events, range(2) t(i)
WHERE ((epoch_us(ts) // 1800000000) - i) * 1800000000 >= 0
GROUP BY 1, 2
"""


def q_events_sessions(sf_dir: str):
    return _with_schema(
        fevents.session_windows(
            _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
        ),
        _empty_tbl(
            {
                "user_id": pa.int64(),
                "session_id": pa.int64(),
                "n_events": pa.int64(),
                "start_us": pa.int64(),
                "end_us": pa.int64(),
                "sum_value": pa.float64(),
            }
        ),
    )


def q_events_throttle(sf_dir: str):
    """Event throttling / burst suppression (streaming dedup): the first
    event of every >1h-gap burst per user (functions/events.py
    burst_heads) — the session kernel's partition shape with a
    head-row projection.  Sorted driver-side for the oracle compare."""
    out = _stable(
        fevents.burst_heads(
            _read(sf_dir, "events", ["event_id", "ts", "user_id"])
        ).to_pandas(),
        {"event_id": "int64", "user_id": "int64", "ts_us": "int64"},
    ).sort_values("event_id")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_EVENTS_THROTTLE = """
WITH g AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_us
  FROM events)
SELECT user_id, event_id, ts_us
FROM g
WHERE prev_us IS NULL OR ts_us - prev_us > 3600000000
ORDER BY event_id
"""


SQL_EVENTS_SESSIONS = """
WITH g AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 3600000000
              OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_id, value, ts_us,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g)
SELECT user_id, session_id::BIGINT AS session_id,
       count(*)::BIGINT AS n_events,
       min(ts_us) AS start_us, max(ts_us) AS end_us,
       round(sum(value), 4) AS sum_value
FROM s GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Relational engine primitives (groupby/aggregate, broadcast join, top-k)
# ---------------------------------------------------------------------------


def q_lineitem_agg(sf_dir: str):
    """Grouped aggregate with pre-aggregation semantics (TPC-H Q1 shape)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    from ray.data.aggregate import Count, Mean, Sum

    out = (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    out = _stable(
        out,
        {
            "l_returnflag": "object",
            "l_linestatus": "object",
            "sum_qty": "float64",
            "sum_base_price": "float64",
            "avg_disc": "float64",
            "count_order": "int64",
        },
    )
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_base_price"] = out["sum_base_price"].round(2)
    out["avg_disc"] = out["avg_disc"].round(6)
    out["count_order"] = out["count_order"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values(["l_returnflag", "l_linestatus"]), preserve_index=False
    )


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_segment_revenue(sf_dir: str):
    """Broadcast hash join (small side via ray.put) + grouped aggregate."""
    import ray

    # small side as a broadcast Arrow table: one ray.put, zero-copy reads in
    # every task; the probe is pc.index_in + take (no per-row Python)
    cust_tbl = pa.Table.from_pandas(
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas(),
        preserve_index=False,
    ).combine_chunks()
    ref = ray.put(cust_tbl)

    def join(batch: pa.Table) -> pa.Table:
        cust = ray.get(ref)
        idx = pc.index_in(batch["o_custkey"], cust["c_custkey"])
        # inner-join semantics: drop orders whose custkey is absent from
        # the dim side (FK integrity hides this on full data; a sliced
        # input must not invent a '' segment the SQL twin can't produce)
        hit = pc.is_valid(idx)
        seg = cust["c_mktsegment"].combine_chunks().take(idx.filter(hit))
        return pa.table(
            {
                "c_mktsegment": seg,
                "o_totalprice": batch["o_totalprice"].filter(hit),
            }
        )

    from ray.data.aggregate import Count, Sum

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(join, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("o_totalprice", alias_name="revenue"),
            Count(alias_name="n_orders"),
        )
        .to_pandas()
    )
    out = _stable(
        out, {"c_mktsegment": "object", "revenue": "float64", "n_orders": "int64"}
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("c_mktsegment"), preserve_index=False
    )


SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment,
       round(sum(o_totalprice), 2) AS revenue,
       count(*)::BIGINT AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


def q_events_props(sf_dir: str):
    """Scalar JSON extraction (the header-dict JSON analogue, §2.10) +
    grouped aggregate over the extracted value.  The extraction is
    vectorized via polars' JSONPath kernel (missing key / null props → 0,
    matching ``json.loads(p).get("k", 0)``); the stdlib per-row loop
    survives as the fallback where polars is absent."""

    def extract(batch: pa.Table) -> pa.Table:
        try:
            import polars as pl

            ks = (
                pl.from_arrow(batch["props"].combine_chunks())
                .str.json_path_match("$.k")
                .cast(pl.Int64)
                .fill_null(0)
                .to_arrow()
                .cast(pa.int64())
            )
        except ImportError:  # pragma: no cover - polars is in this env
            import json as _json

            ks = pa.array(
                [
                    int(_json.loads(p).get("k", 0)) if p else 0
                    for p in batch["props"].to_pylist()
                ],
                pa.int64(),
            )
        return pa.table({"event_type": batch["event_type"], "k": ks})

    from ray.data.aggregate import Count, Sum

    out = (
        _read(sf_dir, "events", ["event_type", "props"])
        .map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"), Count(alias_name="n"))
        .to_pandas()
    )
    out = _stable(
        out, {"event_type": "object", "sum_k": "int64", "n": "int64"}
    )
    out["sum_k"] = out["sum_k"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("event_type"), preserve_index=False)


SQL_EVENTS_PROPS = """
SELECT event_type,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       count(*)::BIGINT AS n
FROM events GROUP BY 1 ORDER BY 1
"""


def q_events_asof_orders(sf_dir: str):
    """Distributed as-of join (functions/asof.py): for every event, the
    user's most recent order at or before the event time — one
    co-partitioning exchange, vectorized in-partition sort + forward-fill
    kernel, then per-user aggregation finished BLOCK-LOCALLY (output blocks
    stay partitioned by user hash, so no second shuffle).

    Tie-break pinned on both sides: among orders sharing
    (o_custkey, o_orderdate) the max o_orderkey wins — the SQL twin
    deduplicates with a row_number() window so DuckDB's otherwise
    arbitrary ASOF tie choice becomes deterministic."""
    from anansi_ray.functions.asof import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    od = _read(
        sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]
    )
    joined = asof_join(
        ev,
        od,
        key="user_id",
        build_key="o_custkey",
        probe_on="ts",
        build_on="o_orderdate",
        probe_carry=["event_id"],
        build_payload=["o_orderkey", "o_totalprice"],
        build_tiebreak="o_orderkey",
    )

    def per_user(batch: pa.Table) -> pa.Table:
        # whole block = one hash partition: every user's rows are local
        m = pc.cast(batch["matched"], pa.int64())
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        chk = pa.array(ok * (eid % 1000 + 1), pa.int64())
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
                "m": m,
                "price": batch["o_totalprice"],
                "chk": chk,
            }
        )
        agg = t.group_by("user_id").aggregate(
            [("one", "sum"), ("m", "sum"), ("price", "sum"), ("chk", "sum")]
        )
        return agg.rename_columns(
            ["user_id", "n_events", "n_matched", "sum_price", "chk"]
        )

    import ray as _ray

    parts = [
        t
        for t in _ray.get(
            joined.map_batches(
                per_user, batch_format="pyarrow", batch_size=None
            )
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        parts = [
            pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_matched": pa.array([], pa.int64()),
                    "sum_price": pa.array([], pa.float64()),
                    "chk": pa.array([], pa.int64()),
                }
            )
        ]
    out = pa.concat_tables(parts).to_pandas()
    out["sum_price"] = out["sum_price"].round(2)
    return pa.Table.from_pandas(out.sort_values("user_id"), preserve_index=False)


SQL_EVENTS_ASOF_ORDERS = """
WITH dedup AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC
         ) AS rn
  FROM orders
), j AS (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
  FROM events e ASOF LEFT JOIN (SELECT * FROM dedup WHERE rn = 1) o
    ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
)
SELECT user_id,
       count(*)::BIGINT AS n_events,
       count(o_orderkey)::BIGINT AS n_matched,
       round(coalesce(sum(o_totalprice), 0), 2) AS sum_price,
       coalesce(sum(o_orderkey * (event_id % 1000 + 1)), 0)::BIGINT AS chk
FROM j GROUP BY 1 ORDER BY 1
"""


def q_token_df(sf_dir: str):
    """Corpus-level document frequency (the IDF building block): token
    explode → per-batch (doc, token) dedup + partial counts (combiner
    BEFORE the exchange — the shuffle carries per-batch vocabularies, not
    the token stream) → coarse_agg hash exchange (never a sort over the
    vocabulary) → top-500 by (df desc, token).
    Integer-exact, so the SQL twin matches bit-for-bit."""
    from anansi_ray.arrowds import coarse_agg

    out = (
        coarse_agg(
            _read(sf_dir, "documents", ["text"]).map_batches(
                ftext.token_df_partial, batch_format="pyarrow"
            ),
            "token",
            {"df": ("sum", "df")},
        )
        .sort(["df", "token"], descending=[True, False])
        .limit(500)
        .to_pandas()
    )
    out = _stable(out, {"token": "object", "df": "int64"})
    out["df"] = out["df"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_TOKEN_DF = r"""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\w+')) AS token
  FROM documents)
SELECT token, count(*)::BIGINT AS df
FROM tok GROUP BY 1
ORDER BY df DESC, token LIMIT 500
"""


def q_orders_events_window(sf_dir: str):
    """Distributed interval (range) join (functions/interval.py): for each
    order, the user's events in the 7 days from the order date — one
    co-partitioning exchange, then a rank-pack + prefix-sum kernel that
    computes per-interval count/sum WITHOUT materializing the joined pairs
    (constant cost per row regardless of fan-out — the interval-join
    blow-up never exists)."""
    from anansi_ray.functions.interval import interval_join_agg

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    od = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"])
    out_ds = interval_join_agg(
        ev,
        od,
        key="user_id",
        point_t="ts",
        point_val="value",
        interval_key="o_custkey",
        interval_lo="o_orderdate",
        interval_len_us=7 * 86400 * 1_000_000,
        interval_carry=["o_orderkey"],
    )
    out = _stable(
        out_ds.drop_columns(["part"]).to_pandas(),
        {
            "user_id": "int64",
            "o_orderkey": "int64",
            "n_points": "int64",
            "sum_val": "float64",
        },
    )
    out["sum_val"] = out["sum_val"].round(2)
    return pa.Table.from_pandas(out.sort_values("o_orderkey"), preserve_index=False)


SQL_ORDERS_EVENTS_WINDOW = """
SELECT o.o_custkey AS user_id, o.o_orderkey,
       count(e.ts)::BIGINT AS n_points,
       round(coalesce(sum(e.value), 0), 2) AS sum_val
FROM orders o LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts < o.o_orderdate + INTERVAL 7 DAY
GROUP BY 1, 2 ORDER BY o_orderkey
"""


def q_pack_sequences(sf_dir: str):
    """Greedy sequence packing (functions/packing.py): bucket-deterministic
    next-fit into 512-token training sequences — packs embarrassingly
    parallel per doc-id bucket; only (doc_id, bucket, n_tokens) ever
    shuffles, never text.  Verified against an independent sequential twin
    whose token counts come from DuckDB's own regex."""
    from anansi_ray.functions.packing import pack_sequences

    out = pack_sequences(_read(sf_dir, "documents", ["doc_id", "text"]))
    df = _stable(
        out.to_pandas(),
        {
            "bucket": "int64",
            "doc_id": "int64",
            "seq_idx": "int64",
            "offset": "int64",
            "n_tokens": "int64",
        },
    ).sort_values("doc_id")
    return pa.Table.from_pandas(df, preserve_index=False)


def q_events_quantiles(sf_dir: str):
    """Exact distributed quantiles via the histogram-partial pattern:
    values snap to a fixed 1e-3 grid (one float multiply + floor — the
    identical IEEE ops on both engines), each batch reduces to (type,
    grid-value, count) partials BEFORE the exchange, the merged histogram
    is tiny (distinct grid values, not rows), and the driver reads the
    lower inverse-CDF at p50/p90/p99 from cumulative counts.  Integer
    exact end-to-end — no approximate-sketch tolerance needed."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        gv = np.floor(v * 1000.0).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        types, tinv = np.unique(et, return_inverse=True)
        # composite (type, grid-value) histogram in pure numpy: shift the
        # grid value into non-negative space so the int key is collision-free
        gmin = gv.min() if len(gv) else 0
        span = int(gv.max() - gmin) + 1 if len(gv) else 1
        key, inv = np.unique(tinv * span + (gv - gmin), return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        first = np.full(len(key), np.iinfo(np.int64).max)
        np.minimum.at(first, inv, np.arange(len(inv)))
        return pa.table(
            {
                "event_type": pa.array(et[first], pa.string()),
                "gv": pa.array(gv[first], pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    hist = (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "gv"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    hist = _stable(
        hist, {"event_type": "object", "gv": "int64", "cnt": "int64"}
    )
    rows = []
    for et, grp in hist.groupby("event_type"):
        grp = grp.sort_values("gv")
        cum = grp["cnt"].cumsum().to_numpy()
        tot = int(cum[-1])
        gvs = grp["gv"].to_numpy()
        qs = []
        for q in (0.5, 0.9, 0.99):
            target = int(np.ceil(q * tot))
            qs.append(int(gvs[np.searchsorted(cum, target, side="left")]))
        rows.append((et, *qs))
    rows.sort()
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "p50_mils": pa.array([r[1] for r in rows], pa.int64()),
            "p90_mils": pa.array([r[2] for r in rows], pa.int64()),
            "p99_mils": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


SQL_EVENTS_QUANTILES = """
WITH g AS (SELECT event_type, floor(value * 1000)::BIGINT AS gv FROM events),
c AS (SELECT event_type, gv, count(*) AS cnt FROM g GROUP BY 1, 2),
w AS (SELECT event_type, gv,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY gv) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS tot
      FROM c)
SELECT event_type,
       min(CASE WHEN cum >= ceil(0.50 * tot) THEN gv END)::BIGINT AS p50_mils,
       min(CASE WHEN cum >= ceil(0.90 * tot) THEN gv END)::BIGINT AS p90_mils,
       min(CASE WHEN cum >= ceil(0.99 * tot) THEN gv END)::BIGINT AS p99_mils
FROM w GROUP BY 1 ORDER BY 1
"""


def q_kmeans(sf_dir: str):
    """Distributed k-means (functions/clustering.py): broadcast centroids,
    per-batch partial-sum combiner, fixed iterations under a rounding
    determinism contract — verified bit-for-bit against the
    single-threaded Lloyd's twin the oracle builder materializes."""
    from anansi_ray.functions.clustering import kmeans_distributed

    return kmeans_distributed(_read(sf_dir, "embeddings", ["vec_id", "embedding"]))


def q_semantic_dedup(sf_dir: str):
    """SemDeDup (functions/semdedup.py): k-means the embedding space
    (partial-sum training, corpus never shuffles), then near-dup
    detection ONLY within each cluster — one coarse hash exchange on the
    cluster id, vectorized per-run cosine kernel, component-minimum
    representative.  Verified bit-for-bit vs the sequential twin the
    oracle builder materializes."""
    from anansi_ray.functions import semdedup as fsem

    return _with_schema(
        fsem.semantic_dedup_distributed(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        ),
        fsem._empty_out(),
    )


def q_doc_char_entropy(sf_dir: str):
    """Per-document byte entropy (functions/text.py char_entropy_batch):
    the compression-style quality signal, one vectorized bincount per
    batch — batch-local, zero shuffle."""
    return _with_schema(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            ftext.char_entropy_batch, batch_format="pyarrow"
        ),
        _empty_tbl(
            {"doc_id": pa.int64(), "n_bytes": pa.int64(), "entropy": pa.float64()}
        ),
    )


SQL_DOC_CHAR_ENTROPY = r"""
WITH ch AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '(?s).')) AS c
  FROM documents),
cnt AS (SELECT doc_id, c, count(*)::DOUBLE AS k FROM ch GROUP BY 1, 2),
tot AS (SELECT doc_id, sum(k) AS n FROM cnt GROUP BY 1),
e AS (SELECT cnt.doc_id,
             round(-sum((k / n) * log2(k / n)), 6) AS entropy,
             max(n)::BIGINT AS n_bytes
      FROM cnt JOIN tot USING (doc_id) GROUP BY cnt.doc_id)
SELECT d.doc_id,
       coalesce(e.n_bytes, 0) AS n_bytes,
       coalesce(e.entropy, 0.0) AS entropy
FROM documents d LEFT JOIN e ON d.doc_id = e.doc_id
ORDER BY d.doc_id
"""



def q_bpe_train(sf_dir: str):
    """BPE vocabulary induction (functions/bpe.py): ONE distributed
    word-count pass (per-batch value-counts combiner → coarse_agg hash
    exchange), per-block partial top-V + tiny driver merge, then the
    pure merge loop on the bounded V-row table (corpus-size-independent).
    The oracle twin recomputes the word counts INDEPENDENTLY in DuckDB
    and runs the same pure loop."""
    from anansi_ray.arrowds import coarse_agg
    from anansi_ray.functions import bpe as fbpe

    counts = coarse_agg(
        _read(sf_dir, "documents", ["text"]).map_batches(
            fbpe.word_count_partial, batch_format="pyarrow"
        ),
        "word",
        {"cnt": ("sum", "cnt")},
    )
    parts = counts.map_batches(
        fbpe.topv_partial, batch_format="pyarrow"
    ).to_pandas()
    if len(parts) == 0:
        return fbpe.empty_out()
    merged = fbpe.top_words(
        list(zip(parts["word"].astype(str), parts["cnt"].astype(int)))
    )
    return fbpe.bpe_merge_loop(merged)


def q_bpe_encode(sf_dir: str):
    """Tokenizer APPLY (the natural pair of ``bpe_train``): train the
    merge table with the same one-counting-pass pipeline, broadcast it,
    then ONE streaming encode pass over the corpus — one encode per
    DISTINCT word per batch (np.unique memo), per-doc stats via
    bincount.  Output: (doc_id, n_words, n_pieces, ratio).  The oracle
    twin recounts words INDEPENDENTLY in DuckDB and applies the same
    pure merge/encode kernels sequentially."""
    import ray as _ray

    from anansi_ray.functions import bpe as fbpe

    merges_tbl = q_bpe_train(sf_dir)
    merges = list(
        zip(
            merges_tbl["left"].to_pylist(),
            merges_tbl["right"].to_pylist(),
        )
    )
    mref = _ray.put(merges)
    out = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            lambda b: fbpe.bpe_encode_batch(b, _ray.get(mref)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if len(out) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
                "n_pieces": pa.array([], pa.int64()),
                "ratio": pa.array([], pa.float64()),
            }
        )
    out = out.sort_values("doc_id", ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_knn_pq(sf_dir: str):
    """Product-quantization ANN (functions/pq.py): per-subspace codebook
    training via the kmeans partial-sum contract, then ONE streaming
    encode + ADC + per-batch partial-top-k pass; codebooks + query
    lookup tables are tiny broadcast state.  Verified bit-for-bit vs the
    sequential twin the oracle builder materializes."""
    from anansi_ray.functions import pq as fpq

    return fpq.knn_pq_distributed(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    )


def q_knn_ivfpq(sf_dir: str):
    """IVF+PQ ANN (functions/pq.py, the FAISS IVFADC composition): coarse
    cells via the kmeans partial-sum contract prune the scan to
    ``IVF_NPROBE`` cells per query; PQ codebooks over residuals give the
    compressed-domain ADC distance inside each probed cell; ONE streaming
    assign→encode→probed-ADC→partial-top-k pass.  Verified bit-for-bit vs
    the sequential twin the oracle builder materializes."""
    from anansi_ray.functions import pq as fpq

    return fpq.knn_ivfpq_distributed(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    )


_STRAT_K = 25


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling (training-data curation): the
    first ``_STRAT_K`` documents per language, ranked by a portable,
    content-independent hash (md5 of the doc id) so re-running the sample
    over a changed corpus keeps every surviving doc's rank stable and the
    SQL twin agrees bit-for-bit.

    Scale shape: per-batch partial top-k per stratum — each batch forwards
    at most strata x k rows (one vectorized lexsort + run-boundary slice,
    no per-group Python) — then one tiny driver-side merge of the
    partials.  The corpus itself never shuffles and never leaves the
    workers."""
    import hashlib

    def _topk(
        langs: np.ndarray,
        rank_hi: np.ndarray,
        rank_lo: np.ndarray,
        ids: np.ndarray,
        with_rank: bool,
    ) -> pa.Table:
        order = np.lexsort((ids, rank_lo, rank_hi, langs))
        ls = langs[order]
        change = np.empty(len(ls), dtype=bool)
        if len(ls):
            change[0] = True
            np.not_equal(ls[1:], ls[:-1], out=change[1:])
        idxs = np.arange(len(ls))
        pos = idxs - idxs[change][np.cumsum(change) - 1]
        keep = pos < _STRAT_K
        sel = order[keep]
        cols = {
            "lang": pa.array(ls[keep], pa.string()),
            "doc_id": pa.array(ids[sel], pa.int64()),
        }
        if with_rank:
            cols["rank"] = pa.array(pos[keep] + 1, pa.int64())
        else:
            cols["rank_hi"] = pa.array(rank_hi[sel], pa.uint64())
            cols["rank_lo"] = pa.array(rank_lo[sel], pa.uint64())
        return pa.table(cols)

    def _rank_keys(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """md5(decimal id) per row, carried as two big-endian uint64 keys.

        Ordering by (hi, lo) is identical to ordering by the hex digest the
        SQL twin uses (hex encoding is byte-monotone).  The decimal render
        is one vectorized np.char pass; the digests land in a single
        contiguous buffer (no per-row hex strings, no object-dtype sort
        keys)."""
        id_bytes = np.char.mod("%d", ids).astype("S").tolist()
        md5 = hashlib.md5
        buf = b"".join([md5(s).digest() for s in id_bytes])
        dig = np.frombuffer(buf, dtype=">u8").reshape(-1, 2)
        return (
            dig[:, 0].astype(np.uint64),
            dig[:, 1].astype(np.uint64),
        )

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        hi, lo = _rank_keys(ids)
        return _topk(langs, hi, lo, ids, with_rank=False)

    import ray as _ray

    parts = [
        t
        for t in _ray.get(
            _read(sf_dir, "documents", ["doc_id", "lang"])
            .map_batches(partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        # empty corpus: no stratum has any member
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(parts)
    out = _topk(
        np.asarray(merged["lang"].to_pylist(), dtype=object),
        merged["rank_hi"].to_numpy(zero_copy_only=False),
        merged["rank_lo"].to_numpy(zero_copy_only=False),
        merged["doc_id"].to_numpy(zero_copy_only=False),
        with_rank=True,
    )
    return out


SQL_STRATIFIED_SAMPLE = f"""
SELECT lang, doc_id, rank FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id
         )::BIGINT AS rank
  FROM documents)
WHERE rank <= {_STRAT_K} ORDER BY lang, rank
"""


def q_order_lineitem_join(sf_dir: str):
    """Co-partitioned large-large hash join: both sides bucketed on the join
    key (hash % B), per-bucket pandas merge inside map_groups, partial
    aggregation inside the bucket, small final combine — the explicit
    partitioned-join pattern for when neither side fits a broadcast."""
    B = 32

    def tag_lineitem(b: pa.Table) -> pa.Table:
        import numpy as np

        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        key = b["l_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b["l_orderkey"],
                "bucket": pa.array((key % B).astype(np.int32), pa.int32()),
                "revenue": rev,
                "o_orderstatus": pa.array([None] * b.num_rows, pa.string()),
                "side": pa.array(["l"] * b.num_rows, pa.string()),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        import numpy as np

        key = b["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b["o_orderkey"],
                "bucket": pa.array((key % B).astype(np.int32), pa.int32()),
                "revenue": pa.array([None] * b.num_rows, pa.float64()),
                "o_orderstatus": b["o_orderstatus"],
                "side": pa.array(["o"] * b.num_rows, pa.string()),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        tag_lineitem, batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]).map_batches(
        tag_orders, batch_format="pyarrow"
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        left = df[df["side"] == "l"][["key", "revenue"]]
        right = df[df["side"] == "o"][["key", "o_orderstatus"]]
        merged = left.merge(right, on="key", how="inner")
        agg = merged.groupby("o_orderstatus", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("revenue", "size")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = (
        li.union(orders)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    partials = _stable(
        partials,
        {"o_orderstatus": "object", "revenue": "float64", "n_items": "int64"},
    )
    out = partials.groupby("o_orderstatus", as_index=False).agg(
        revenue=("revenue", "sum"), n_items=("n_items", "sum")
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("o_orderstatus"), preserve_index=False
    )


SQL_ORDER_LINEITEM_JOIN = """
SELECT o_orderstatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)::BIGINT AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1 ORDER BY 1
"""


def q_orders_topk(sf_dir: str):
    """Distributed sort + limit (O2/O3 analogue)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = (
        ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(100)
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_ORDERS_TOPK = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


# ---------------------------------------------------------------------------
# Oracle side-tables: deterministic artifacts DuckDB reads via
# read_parquet() for queries whose INPUTS are not SQL-derivable (the crawl
# fixture web, the synthetic media table, LSH candidate pair keys).  The
# artifacts are produced by INDEPENDENT single-threaded code (the pure-
# Python reference crawler, numpy MinHash) — never by the Ray pipeline
# under test.  Generated inside oracle_sql() so they exist regardless of
# the order the driver evaluates queries vs oracles.
# ---------------------------------------------------------------------------

ORACLE_DIR = "/tmp/anansi_oracle"
_ORACLE_VERSION = "v22"  # bump whenever artifact-affecting code changes
# v22: added the curate→pack twin (pack_kept.parquet)
# v21: added the logreg cross-validation twin (logreg_cv.parquet)
# v20: added the PPMI-SVD embedding twin (word_emb_knn.parquet)
# v19: added the Markov-attribution twin (markov_attr.parquet)
# v18: added the PCA eigen-spectrum twin (pca_spectrum.parquet)
# v17: logreg distinct-token feature fixed (integer pair keys) ⇒ new weights
# v16: added the CDC chunk-dedup twin (cdc_dedup.parquet)
# v14: added the BPE encode twin (bpe_encode.parquet)
# v15: added the HLL distinct twin (hll_distinct.parquet)
# v12: added the logistic-regression twin (logreg.parquet)
# v13: added the ALS item-factor twin (als_factors.parquet)
# v9: added the SemDeDup twin (semdedup.parquet) + PQ ANN twin (pq_knn.parquet)
# v10: added the BPE merge-table twin (bpe_merges.parquet)
# v11: added the IVF+PQ twin (ivfpq_knn.parquet)
# v6: added the k-means assignment twin (kmeans.parquet)
# v7: added the sequence-packing twin (pack.parquet)
# v4: vectorized shingle hashing (token-hash fold) changed signature values
# v5: fixture rdfxml payloads use xml:base + relative rdf:about (fixture v4)


def _minhash_pairs_local(tbl: pa.Table, min_est: float) -> pa.Table:
    """Single-threaded numpy MinHash-LSH candidate pairs (band buckets +
    signature-agreement filter) — the driver-side twin of the distributed
    band/verify path, used only to materialize oracle pair KEYS; the pair
    VALUES (exact n-gram Jaccard) are then recomputed by DuckDB itself."""
    import hashlib

    ids = tbl["doc_id"].to_pylist()
    texts = tbl["text"].to_pylist()
    sigs = {d: fdedup.minhash_signature(t) for d, t in zip(ids, texts)}
    buckets: dict = {}
    for d, sig in sigs.items():
        bands = sig.reshape(fdedup.N_BANDS, fdedup.ROWS_PER_BAND)
        for b in range(fdedup.N_BANDS):
            key = (b, hashlib.blake2b(bands[b].tobytes(), digest_size=8).hexdigest())
            buckets.setdefault(key, []).append(d)
    cand = set()
    for members in buckets.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add((members[i], members[j]))
    keep = sorted(
        (a, b) for a, b in cand if float((sigs[a] == sigs[b]).mean()) >= min_est
    )
    return pa.table(
        {
            "a": pa.array([p[0] for p in keep], pa.int64()),
            "b": pa.array([p[1] for p in keep], pa.int64()),
        }
    )


def _emb_lsh_pairs_local(tbl: pa.Table, threshold: float) -> pa.Table:
    """Single-threaded numpy hyperplane-LSH near-dup pairs — the oracle
    twin of fdedup.embedding_near_dup_lsh (shared per-record math:
    lsh_planes / normalize_rows / lsh_bucket_sigs / pair_cosine — all
    integer-exact or single-ddot deterministic — fully independent
    orchestration)."""
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    mat = fdedup.normalize_rows(np.asarray(tbl["embedding"].to_pylist(), np.float64))
    planes = fdedup.lsh_planes(mat.shape[1])
    sigs = fdedup.lsh_bucket_sigs(mat, planes)  # (n, n_tables)
    buckets: dict = {}
    for i in range(len(ids)):
        for t in range(sigs.shape[1]):
            buckets.setdefault((t, int(sigs[i, t])), []).append(i)
    out: dict[tuple[int, int], float] = {}
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                if ids[i] > ids[j]:
                    i, j = j, i
                key = (int(ids[i]), int(ids[j]))
                if key in out:
                    continue
                c = fdedup.pair_cosine(mat[i], mat[j])
                if c >= threshold:
                    out[key] = c
    keep = sorted(out)
    return pa.table(
        {
            "a": pa.array([k[0] for k in keep], pa.int64()),
            "b": pa.array([k[1] for k in keep], pa.int64()),
            "cosine": pa.array([out[k] for k in keep], pa.float64()),
        }
    )


def _point_oracle_symlink(target: str) -> None:
    """Atomically point ORACLE_DIR (the path baked into the static SQL
    strings at import time) at the requested build directory."""
    import shutil

    if os.path.lexists(ORACLE_DIR) and not os.path.islink(ORACLE_DIR):
        # a real directory from a pre-symlink run occupies the path
        shutil.rmtree(ORACLE_DIR, ignore_errors=True)
    tmp = f"{ORACLE_DIR}.lnk.{os.getpid()}"
    try:
        os.remove(tmp)
    except FileNotFoundError:
        pass
    os.symlink(target, tmp)
    os.replace(tmp, ORACLE_DIR)


def ensure_oracle_artifacts(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Idempotent build of the oracle side-tables.

    Data-dependent artifacts (minhash groups, logreg preds, ALS factors,
    BPE merges, …) are functions of the SF DATA, so each sf_dir builds
    into its own directory and ``ORACLE_DIR`` — the path the static SQL
    strings bake in at import — is an atomically-swapped symlink to the
    requested sf's build.  The driver's sf0.01 gate and the sf0.1 sweep
    therefore both check against artifacts derived from the data they
    query, and switching scale factors never rebuilds what exists.
    Returns the REAL per-sf directory: a consumer that must be immune to
    another process re-pointing the shared symlink (the sweep harness)
    rewrites ``ORACLE_DIR`` to this path in the SQL it executes."""
    import hashlib as _hl

    import pyarrow.parquet as pq

    key = _hl.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    out = f"{ORACLE_DIR}_{key}"
    marker = os.path.join(out, f"_COMPLETE_{_ORACLE_VERSION}")
    if os.path.exists(marker):
        _point_oracle_symlink(out)
        return out
    os.makedirs(out, exist_ok=True)

    # 1. reference-semantics crawl of the deterministic tiny fixture
    #    (pure Python, no Ray — the same oracle the conformance tests use)
    from anansi_ray import fixtures
    from anansi_ray.functions.spans import flatten_spans_batch
    from anansi_ray.oracle import reference_crawl

    tables = fixtures.generate("tiny", seed=42)
    res = reference_crawl(tables, CrawlConfig(), budget=None)
    pq.write_table(res["expected_crawl"], os.path.join(out, "crawl_order.parquet"))
    docs = res["documents"]
    docs = docs.take(pc.sort_indices(docs, sort_keys=[("doc_id", "ascending")]))
    flat = flatten_spans_batch(docs)
    from anansi_ray.functions.spans import span_sig_batch

    flat = flat.append_column("span_sig", span_sig_batch(docs)["span_sig"])
    pq.write_table(
        flat.select(
            [
                "doc_id",
                "text",
                "media_refs",
                "n_spans",
                "n_text_spans",
                "n_media_spans",
                "span_sig",
            ]
        ),
        os.path.join(out, "crawl_docs_flat.parquet"),
    )

    # 1b. the tiny web's redirect edges (url → redirect), for the
    #     redirect-alias resolution twin's recursive CTE
    pq.write_table(
        tables["web"].select(["url", "redirect"]),
        os.path.join(out, "web_redirects.parquet"),
    )

    # 2. the synthetic media table (payloads included: DuckDB recomputes
    #    the fake-decode features from the blobs)
    pq.write_table(
        fmedia.synthesize_media_table(n=256, seed=42),
        os.path.join(out, "media.parquet"),
    )

    # 3. MinHash-LSH artifacts over the driver's sf0.01 documents:
    #    candidate pair keys (τ=0.3) for the ngram-Jaccard oracle, and the
    #    full near-dup groups (τ=0.5 pairs → driver union-find) — the
    #    single-threaded twin the DISTRIBUTED banding/repartition-join/
    #    label-propagation pipeline must reproduce exactly (shared
    #    per-record math, fully independent orchestration — the same
    #    check structure as the crawl-order oracle)
    sfdoc = os.path.join(sf_dir, "documents.parquet")
    if os.path.exists(sfdoc):
        t = pq.read_table(sfdoc, columns=["doc_id", "text"])
        pq.write_table(
            _minhash_pairs_local(t, 0.3),
            os.path.join(out, "ngram_cand.parquet"),
        )
        pairs_05 = _minhash_pairs_local(t, 0.5)
        groups = fdedup.connected_components(
            pairs_05, pq.read_table(sfdoc, columns=["doc_id"])["doc_id"].to_pylist()
        )
        pq.write_table(groups, os.path.join(out, "minhash_groups.parquet"))

    # 4. hyperplane-LSH embedding near-dup pairs (integer-exact bucketing
    #    ⇒ the twin reproduces the distributed output value-exactly)
    sfemb = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(sfemb):
        t = pq.read_table(sfemb, columns=["vec_id", "embedding"])
        pq.write_table(
            _emb_lsh_pairs_local(t, NEAR_DUP_TAU),
            os.path.join(out, "emb_lsh_pairs.parquet"),
        )

        # 5. k-means assignment twin: single-threaded Lloyd's under the
        #    determinism contract of functions/clustering.py (rounded
        #    centroids per iteration ⇒ the distributed partial-sum path
        #    must land on the identical assignment)
        from anansi_ray.functions.clustering import kmeans_local

        pq.write_table(
            kmeans_local(t), os.path.join(out, "kmeans.parquet")
        )

        # 5b. SemDeDup twin: kmeans_local assignment + the same
        #     per-cluster cosine kernel, sequential orchestration
        #     (functions/semdedup.py determinism contract)
        from anansi_ray.functions.semdedup import semantic_dedup_local

        pq.write_table(
            semantic_dedup_local(t), os.path.join(out, "semdedup.parquet")
        )

        # 5c. PQ ANN twin: per-subspace codebooks under the same rounding
        #     contract, one-sweep encode + ADC + top-k
        #     (functions/pq.py determinism contract)
        from anansi_ray.functions.pq import knn_pq_local

        pq.write_table(
            knn_pq_local(t), os.path.join(out, "pq_knn.parquet")
        )

        # 5g. PCA twin: one covariance slice + eigvalsh on the rounded
        #     matrix (functions/pca.py determinism contract)
        from anansi_ray.functions.pca import pca_local

        pq.write_table(
            pca_local(t), os.path.join(out, "pca_spectrum.parquet")
        )

        # 5d. IVF+PQ twin: coarse quantizer + residual codebooks under the
        #     same contracts, sequential probed-cell ADC search
        #     (functions/pq.py knn_ivfpq_local determinism contract)
        from anansi_ray.functions.pq import knn_ivfpq_local

        pq.write_table(
            knn_ivfpq_local(t), os.path.join(out, "ivfpq_knn.parquet")
        )

    # 5f. ALS twin: INDEPENDENT DuckDB ratings build (orders ⨝ lineitem),
    #     then the sequential factor loop under the rounding contract
    #     (functions/als.py)
    sfli = os.path.join(sf_dir, "lineitem.parquet")
    sford = os.path.join(sf_dir, "orders.parquet")
    if os.path.exists(sfli) and os.path.exists(sford):
        import duckdb

        from anansi_ray.functions.als import als_local

        ratings = (
            duckdb.connect()
            .execute(
                "SELECT o.o_custkey::BIGINT AS custkey, "
                "l.l_partkey::BIGINT AS partkey, "
                "sum(l.l_quantity)::DOUBLE AS qty "
                f"FROM read_parquet('{sford}') o "
                f"JOIN read_parquet('{sfli}') l ON o.o_orderkey = l.l_orderkey "
                "GROUP BY 1, 2"
            )
            .arrow()
        )
        pq.write_table(
            als_local(ratings), os.path.join(out, "als_factors.parquet")
        )

    # 5e. logistic-regression twin: sequential full-batch GD under the
    #     same rounding contract (functions/logreg.py)
    if os.path.exists(sfdoc):
        from anansi_ray.functions.logreg import logreg_local

        pq.write_table(
            logreg_local(
                pq.read_table(sfdoc, columns=["doc_id", "text", "lang"])
            ),
            os.path.join(out, "logreg.parquet"),
        )

        # 5e-bis. cross-validation twin (same fold rule, sequential)
        from anansi_ray.functions.logreg import logreg_cv_local

        pq.write_table(
            logreg_cv_local(
                pq.read_table(sfdoc, columns=["doc_id", "text", "lang"])
            ),
            os.path.join(out, "logreg_cv.parquet"),
        )

    # 6. sequence-packing twin: token counts via DuckDB's own regex (the
    #    SQL_TOKEN_COUNT expression, independent of the Arrow kernel), then
    #    an INDEPENDENT sequential next-fit — one flat pass over all docs
    #    in id order with bucket-boundary resets, structurally unlike the
    #    distributed per-bucket map_groups kernel it checks
    if os.path.exists(sfdoc):
        import duckdb

        from anansi_ray.functions.packing import PACK_BUCKET, PACK_BUDGET

        rows = (
            duckdb.connect()
            .execute(
                "SELECT doc_id, len(regexp_extract_all(text, "
                "'[A-Za-z0-9]+|[^\\sA-Za-z0-9]'))::BIGINT AS n "
                f"FROM read_parquet('{sfdoc}') ORDER BY doc_id"
            )
            .fetchall()
        )
        recs = []
        cur_bucket, sidx, fill = None, 0, 0
        for doc_id, n in rows:
            b = doc_id // PACK_BUCKET
            if b != cur_bucket:
                cur_bucket, sidx, fill = b, 0, 0
            if fill > 0 and fill + n > PACK_BUDGET:
                sidx += 1
                fill = 0
            recs.append((b, doc_id, sidx, fill, n))
            fill += n
        pq.write_table(
            pa.table(
                {
                    "bucket": pa.array([r[0] for r in recs], pa.int64()),
                    "doc_id": pa.array([r[1] for r in recs], pa.int64()),
                    "seq_idx": pa.array([r[2] for r in recs], pa.int64()),
                    "offset": pa.array([r[3] for r in recs], pa.int64()),
                    "n_tokens": pa.array([r[4] for r in recs], pa.int64()),
                }
            ),
            os.path.join(out, "pack.parquet"),
        )

    # 9. CDC chunk-dedup twin: sequential chunk+hash over the same
    #    deterministic media table (functions/cdc.py — one slice IS the
    #    global chunk table)
    from anansi_ray.functions.cdc import cdc_dedup_local

    pq.write_table(
        cdc_dedup_local(fmedia.synthesize_media_table(n=256, seed=42)),
        os.path.join(out, "cdc_dedup.parquet"),
    )

    # 11. PPMI-SVD embedding twin: pair counts recomputed INDEPENDENTLY
    #     in DuckDB, shared PPMI/SVD/neighbour kernels
    #     (functions/embed_train.py)
    if os.path.exists(sfdoc):
        import duckdb

        import numpy as _np

        from anansi_ray.functions import embed_train as femb

        con = duckdb.connect()
        vocab_rows = con.execute(
            "WITH tok AS (SELECT DISTINCT doc_id, "
            r"unnest(regexp_extract_all(lower(coalesce(text, '')), '\w+')) AS t "
            f"FROM read_parquet('{sfdoc}')), "
            "df AS (SELECT t, count(*)::BIGINT AS df FROM tok GROUP BY 1) "
            "SELECT t, df FROM df ORDER BY df DESC, t LIMIT 50"
        ).fetchall()
        if vocab_rows:
            vocab_rows.sort(key=lambda r: r[0])  # alphabetical index order
            vocab = _np.array([r[0] for r in vocab_rows], dtype=object)
            dfv = _np.array([r[1] for r in vocab_rows], _np.int64)
            vidx = {t: i for i, t in enumerate(vocab)}
            n_docs_twin = con.execute(
                f"SELECT count(*) FROM read_parquet('{sfdoc}')"
            ).fetchone()[0]
            pair_rows = con.execute(
                "WITH tok AS (SELECT DISTINCT doc_id, "
                r"unnest(regexp_extract_all(lower(coalesce(text, '')), '\w+')) AS t "
                f"FROM read_parquet('{sfdoc}')), "
                "df AS (SELECT t, count(*)::BIGINT AS df FROM tok GROUP BY 1), "
                "vocab AS (SELECT t FROM df ORDER BY df DESC, t LIMIT 50), "
                "vt AS (SELECT doc_id, t FROM tok WHERE t IN (SELECT t FROM vocab)) "
                "SELECT x.t, y.t, count(*)::BIGINT FROM vt x "
                "JOIN vt y ON x.doc_id = y.doc_id AND x.t < y.t GROUP BY 1, 2"
            ).fetchall()
            ia = _np.array([vidx[a] for a, _, _ in pair_rows], _np.int64)
            ib = _np.array([vidx[b] for _, b, _ in pair_rows], _np.int64)
            nab = _np.array([c for _, _, c in pair_rows], _np.int64)
            M = femb.ppmi_matrix(ia, ib, nab, dfv, int(n_docs_twin))
            pq.write_table(
                femb.svd_neighbors(M, vocab),
                os.path.join(out, "word_emb_knn.parquet"),
            )
        else:
            pq.write_table(
                femb.empty_out(),
                os.path.join(out, "word_emb_knn.parquet"),
            )

    # 10. Markov-attribution twin: sequential journey kernel + absorbing
    #     solve over the same events table (functions/attribution.py)
    sfev = os.path.join(sf_dir, "events.parquet")
    if os.path.exists(sfev):
        from anansi_ray.functions.attribution import markov_attribution_local

        pq.write_table(
            markov_attribution_local(
                pq.read_table(
                    sfev, columns=["event_id", "ts", "user_id", "event_type"]
                ),
                ["click", "error", "signup", "view"],
            ),
            os.path.join(out, "markov_attr.parquet"),
        )

    # 8. HLL distinct-count twin: register max-merge is commutative and
    #    idempotent, so ONE sequential hll_partial_batch over the whole
    #    events table produces exactly the registers the distributed
    #    groupby(group, register).max path converges to — the estimates
    #    are therefore value-equal, not merely close (functions/sketch.py)
    sfev = os.path.join(sf_dir, "events.parquet")
    if os.path.exists(sfev):
        from anansi_ray.functions.sketch import (
            HLL_M,
            hll_estimate,
            hll_partial_batch,
        )

        ev = pq.read_table(sfev, columns=["event_type", "user_id"])
        regs = hll_partial_batch(ev, "user_id", "event_type").to_pandas()
        import numpy as _np

        out_g, out_e = [], []
        for g_, sub in regs.groupby("event_type", sort=True):
            dense = _np.zeros(HLL_M, _np.int64)
            dense[sub["register"].to_numpy()] = sub["rho"].to_numpy()
            out_g.append(g_)
            out_e.append(int(round(hll_estimate(dense))))
        pq.write_table(
            pa.table(
                {
                    "event_type": pa.array(out_g, pa.string()),
                    "approx_distinct": pa.array(out_e, pa.int64()),
                }
            ),
            os.path.join(out, "hll_distinct.parquet"),
        )

    # 7. BPE merge-table twin: word counts recomputed INDEPENDENTLY in
    #    DuckDB (string_split, not the Arrow kernel), same deterministic
    #    top-V cut + pure merge loop (functions/bpe.py)
    if os.path.exists(sfdoc):
        import duckdb

        from anansi_ray.functions import bpe as fbpe

        rows = (
            duckdb.connect()
            .execute(
                "SELECT word, count(*)::BIGINT AS cnt FROM ("
                "SELECT unnest(string_split(coalesce(text, ''), ' ')) AS word "
                f"FROM read_parquet('{sfdoc}')) WHERE word != '' GROUP BY word"
            )
            .fetchall()
        )
        merges_twin = fbpe.bpe_merge_loop(
            fbpe.top_words([(w, int(c)) for w, c in rows])
        )
        pq.write_table(
            merges_twin, os.path.join(out, "bpe_merges.parquet")
        )

        # 7b. BPE encode twin: apply the twin's merge table sequentially
        #     over the whole documents table (functions/bpe.py encode
        #     kernels, one slice)
        mlist = list(
            zip(merges_twin["left"].to_pylist(), merges_twin["right"].to_pylist())
        )
        enc = fbpe.bpe_encode_batch(
            pq.read_table(sfdoc, columns=["doc_id", "text"]), mlist
        ).to_pandas()
        pq.write_table(
            pa.Table.from_pandas(
                enc.sort_values("doc_id", ignore_index=True), preserve_index=False
            ),
            os.path.join(out, "bpe_encode.parquet"),
        )

    # 12. curate→pack twin: the per-doc disposition recomposed IN DUCKDB
    #     from the independent stage artifacts written above (the same
    #     SQL the curation twin runs), then the sequential next-fit over
    #     KEPT docs only — the end-to-end "curate then pack" reference.
    if os.path.exists(sfdoc):
        import duckdb

        from anansi_ray.functions.packing import PACK_BUCKET, PACK_BUDGET

        con2 = duckdb.connect()
        con2.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sfdoc}')"
        )
        disp_sql = SQL_CURATION_PIPELINE.replace(ORACLE_DIR + "/", out + "/")
        kept_ids = {
            int(r[0])
            for r in con2.execute(
                "WITH d AS ("
                + disp_sql.replace("ORDER BY d.doc_id", "")
                + ") SELECT doc_id FROM d WHERE disposition = 'kept'"
            ).fetchall()
        }
        rows = con2.execute(
            "SELECT doc_id, len(regexp_extract_all(text, "
            "'[A-Za-z0-9]+|[^\\sA-Za-z0-9]'))::BIGINT AS n "
            f"FROM read_parquet('{sfdoc}') ORDER BY doc_id"
        ).fetchall()
        recs = []
        cur_bucket, sidx, fill = None, 0, 0
        for doc_id, n in rows:
            if int(doc_id) not in kept_ids:
                continue
            b = doc_id // PACK_BUCKET
            if b != cur_bucket:
                cur_bucket, sidx, fill = b, 0, 0
            if fill > 0 and fill + n > PACK_BUDGET:
                sidx += 1
                fill = 0
            recs.append((b, doc_id, sidx, fill, n))
            fill += n
        pq.write_table(
            pa.table(
                {
                    "bucket": pa.array([r[0] for r in recs], pa.int64()),
                    "doc_id": pa.array([r[1] for r in recs], pa.int64()),
                    "seq_idx": pa.array([r[2] for r in recs], pa.int64()),
                    "offset": pa.array([r[3] for r in recs], pa.int64()),
                    "n_tokens": pa.array([r[4] for r in recs], pa.int64()),
                }
            ),
            os.path.join(out, "pack_kept.parquet"),
        )

    with open(marker, "w") as f:
        f.write(os.path.abspath(sf_dir))
    _point_oracle_symlink(out)
    return out


SQL_NGRAM_JACCARD = rf"""
WITH cand AS (SELECT a, b FROM read_parquet('{ORACLE_DIR}/ngram_cand.parquet')),
tok AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\w+') AS toks
  FROM documents),
grams AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(len(toks) - 2),
                   i -> toks[(i+1)::INT] || ' ' || toks[(i+2)::INT] || ' ' || toks[(i+3)::INT]))
              ELSE [array_to_string(toks, ' ')] END AS gs
  FROM tok)
SELECT c.a, c.b,
       round(len(list_intersect(ga.gs, gb.gs))
             / greatest(len(ga.gs) + len(gb.gs) - len(list_intersect(ga.gs, gb.gs)), 1), 6)
           AS jaccard
FROM cand c
JOIN grams ga ON ga.doc_id = c.a
JOIN grams gb ON gb.doc_id = c.b
ORDER BY c.a, c.b
"""

SQL_EMB_NEAR_DUP_LSH = f"""
SELECT a, b, cosine
FROM read_parquet('{ORACLE_DIR}/emb_lsh_pairs.parquet')
ORDER BY a, b
"""

SQL_KMEANS = f"""
SELECT vec_id, cluster
FROM read_parquet('{ORACLE_DIR}/kmeans.parquet')
ORDER BY vec_id
"""

SQL_SEMANTIC_DEDUP = f"""
SELECT vec_id, cluster, rep_id, keep
FROM read_parquet('{ORACLE_DIR}/semdedup.parquet')
ORDER BY vec_id
"""

SQL_KNN_PQ = f"""
SELECT query_id, "rank", vec_id, adc
FROM read_parquet('{ORACLE_DIR}/pq_knn.parquet')
ORDER BY query_id, "rank"
"""

SQL_WORD_EMBEDDING_KNN = f"""
SELECT probe, "rank", neighbor, cosine
FROM read_parquet('{ORACLE_DIR}/word_emb_knn.parquet')
ORDER BY probe, "rank"
"""

SQL_MARKOV_ATTRIBUTION = f"""
SELECT channel, base_cvr, cvr_without, removal_effect, attribution
FROM read_parquet('{ORACLE_DIR}/markov_attr.parquet')
ORDER BY channel
"""

SQL_EMBEDDING_PCA = f"""
SELECT component, eigenvalue, explained_ratio
FROM read_parquet('{ORACLE_DIR}/pca_spectrum.parquet')
ORDER BY component
"""

SQL_CDC_CHUNK_DEDUP = f"""
SELECT n_chunks, n_unique, bytes_total, bytes_unique, dedup_ratio
FROM read_parquet('{ORACLE_DIR}/cdc_dedup.parquet')
"""

SQL_APPROX_DISTINCT_USERS = f"""
SELECT event_type, approx_distinct
FROM read_parquet('{ORACLE_DIR}/hll_distinct.parquet')
ORDER BY event_type
"""

SQL_BPE_ENCODE = f"""
SELECT doc_id, n_words, n_pieces, ratio
FROM read_parquet('{ORACLE_DIR}/bpe_encode.parquet')
ORDER BY doc_id
"""

SQL_ALS_FACTORS = f"""
SELECT partkey, j, factor
FROM read_parquet('{ORACLE_DIR}/als_factors.parquet')
ORDER BY partkey, j
"""

SQL_LOGREG_CV = f"""
SELECT fold, n_train, n_test, accuracy
FROM read_parquet('{ORACLE_DIR}/logreg_cv.parquet')
ORDER BY fold
"""

SQL_LOGREG_QUALITY = f"""
SELECT doc_id, label, prob, pred
FROM read_parquet('{ORACLE_DIR}/logreg.parquet')
ORDER BY doc_id
"""

SQL_KNN_IVFPQ = f"""
SELECT query_id, "rank", vec_id, adc
FROM read_parquet('{ORACLE_DIR}/ivfpq_knn.parquet')
ORDER BY query_id, "rank"
"""

SQL_BPE_TRAIN = f"""
SELECT merge_rank, "left", "right", merged, pair_count
FROM read_parquet('{ORACLE_DIR}/bpe_merges.parquet')
ORDER BY merge_rank
"""

SQL_PACK_SEQUENCES = f"""
SELECT bucket, doc_id, seq_idx, "offset", n_tokens
FROM read_parquet('{ORACLE_DIR}/pack.parquet')
ORDER BY doc_id
"""

SQL_MINHASH_NEAR_DUP = f"""
SELECT doc_id, dup_group
FROM read_parquet('{ORACLE_DIR}/minhash_groups.parquet')
ORDER BY doc_id
"""

SQL_CRAWL_ORDER = f"""
SELECT seq, fetch_clock_ms, url_hash, url, state, status
FROM read_parquet('{ORACLE_DIR}/crawl_order.parquet')
ORDER BY seq
"""

SQL_CRAWL_HOST_PROFILE = f"""
WITH t AS (
  SELECT regexp_extract(url, '^[a-z0-9+.-]+://[^/]+') AS host,
         fetch_clock_ms AS clock
  FROM read_parquet('{ORACLE_DIR}/crawl_order.parquet')),
g AS (
  SELECT host, clock,
         clock - lag(clock) OVER (PARTITION BY host ORDER BY clock) AS gap
  FROM t)
SELECT host,
       count(*)::BIGINT AS n_fetches,
       coalesce(min(gap), -1)::BIGINT AS min_gap_ms,
       (max(clock) - min(clock))::BIGINT AS span_ms
FROM g GROUP BY host ORDER BY host
"""

SQL_CRAWL_DOC_PIPELINE = rf"""
WITH t AS (SELECT * FROM read_parquet('{ORACLE_DIR}/crawl_docs_flat.parquet')),
q AS (
  SELECT doc_id, n_spans, n_text_spans, n_media_spans,
         length(text) AS n_chars,
         length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct,
         string_split_regex(trim(text), '\s+') AS toks,
         text
  FROM t)
SELECT doc_id, n_spans, n_text_spans, n_media_spans,
       n_chars::BIGINT AS n_chars,
       round(n_punct / greatest(n_chars, 1), 6) AS punct_ratio,
       round(len(list_filter(toks, x -> x IN ('the','a','and','of','to','in')))
             / greatest(len(toks), 1), 6) AS stopword_ratio,
       round(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
             / greatest(len(toks), 1), 6) AS mean_word_len,
       len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens_ws,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]'))::BIGINT AS n_tokens,
       md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp_md5
FROM q ORDER BY doc_id
"""

#: fake-decode features recomputed in SQL: 16 big-endian uint32 words from
#: sha256(kind || hex) || sha256(kind || hex || chr(1)), each /2^32,
#: rounded to 6 — signature = md5 over the '%.6f'-formatted vector
SQL_MEDIA_FEATURES = f"""
WITH m AS (
  SELECT media_id, kind, payload, kind || lower(to_hex(payload)) AS base
  FROM read_parquet('{ORACLE_DIR}/media.parquet')),
h AS (
  SELECT media_id, kind, octet_length(payload)::BIGINT AS payload_bytes,
         sha256(base) || sha256(base || chr(1)) AS hex128
  FROM m),
f AS (
  SELECT media_id, kind, payload_bytes,
         list_transform(range(16),
           i -> round((('0x' || substr(hex128, (8*i+1)::INT, 8))::UBIGINT)::DOUBLE
                      / 4294967296.0, 6)) AS feats
  FROM h)
SELECT media_id, kind, payload_bytes,
       md5(array_to_string(list_transform(feats, x -> printf('%.6f', x)), ',')) AS feature_sig
FROM f ORDER BY media_id
"""


# ---------------------------------------------------------------------------
# Multimodal + crawl pipeline queries
# ---------------------------------------------------------------------------


def q_media_features(sf_dir: str):
    """Actor-pool media decode/feature stage over the synthetic media table;
    projected to (media_id, kind, payload_bytes, feature_sig) — the md5 of
    the '%.6f'-rendered feature vector — so the DuckDB oracle can verify
    every feature value through a hashable scalar column."""
    ds = rd.from_arrow(fmedia.synthesize_media_table(n=256, seed=42))
    feats = fmedia.extract_media_features(ds)

    def project(batch: pa.Table) -> pa.Table:
        import hashlib

        sigs = [
            hashlib.md5(",".join(f"{v:.6f}" for v in f).encode()).hexdigest()
            for f in batch["feature"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload_bytes": batch["payload_bytes"],
                "feature_sig": pa.array(sigs, pa.string()),
            }
        )

    out = feats.map_batches(project, batch_format="pyarrow").to_pandas()
    return pa.Table.from_pandas(out.sort_values("media_id"), preserve_index=False)


def q_crawl_media_pipeline(sf_dir: str):
    """End-to-end multimodal path: crawl → interleaved spans → media_refs
    exploded → deterministic payload synthesis → actor-pool decode/feature
    stage — 'crawl to multimodal training data' over the engine's own
    output.  Payload synthesis is a pure function of the ref (kind by
    length parity, payload = 'media:<ref>' repeated) so the DuckDB oracle
    recomputes byte counts AND feature signatures from the reference
    crawler's documents alone."""
    from anansi_ray.functions.spans import flatten_spans_batch

    docs = _crawl_results()["documents"]
    flat = flatten_spans_batch(docs)

    def explode_refs(batch: pa.Table) -> pa.Table:
        doc_ids, refs = [], []
        for d, rs in zip(batch["doc_id"].to_pylist(), batch["media_refs"].to_pylist()):
            for r in rs or ():
                doc_ids.append(d)
                refs.append(r)
        kinds = ["image" if len(r) % 2 == 0 else "audio" for r in refs]
        payloads = [("media:" + r) * (len(r) % 5 + 1) for r in refs]
        return pa.table(
            {
                "media_id": pa.array(refs, pa.string()),
                "doc_id": pa.array(doc_ids, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array([p.encode() for p in payloads], pa.binary()),
            }
        )

    media = rd.from_arrow(flat.select(["doc_id", "media_refs"])).map_batches(
        explode_refs, batch_format="pyarrow"
    )
    feats = fmedia.extract_media_features(media)

    def project(batch: pa.Table) -> pa.Table:
        import hashlib

        sigs = [
            hashlib.md5(",".join(f"{v:.6f}" for v in f).encode()).hexdigest()
            for f in batch["feature"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_id"],
                "kind": batch["kind"],
                "payload_bytes": batch["payload_bytes"],
                "feature_sig": pa.array(sigs, pa.string()),
            }
        )

    out = feats.map_batches(project, batch_format="pyarrow").to_pandas()
    return pa.Table.from_pandas(
        out.sort_values(["doc_id", "media_ref"]), preserve_index=False
    )


SQL_MEDIA_PAYLOAD_DEDUP = f"""
WITH refs AS (
  SELECT doc_id, unnest(media_refs) AS media_ref
  FROM read_parquet('{ORACLE_DIR}/crawl_docs_flat.parquet')),
p AS (
  SELECT doc_id, media_ref,
         repeat('media:' || media_ref, length(media_ref) % 5 + 1)
           AS payload_str
  FROM refs),
h AS (
  SELECT doc_id, media_ref, md5(payload_str) AS payload_md5,
         length(payload_str)::BIGINT AS payload_bytes,
         doc_id || '|' || media_ref AS keeper
  FROM p)
SELECT payload_md5, count(*)::BIGINT AS n_refs,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       min(payload_bytes) AS payload_bytes,
       min(keeper) AS keeper
FROM h GROUP BY 1 ORDER BY 1
"""


SQL_CRAWL_MEDIA_PIPELINE = f"""
WITH refs AS (
  SELECT doc_id, unnest(media_refs) AS media_ref
  FROM read_parquet('{ORACLE_DIR}/crawl_docs_flat.parquet')),
p AS (
  SELECT doc_id, media_ref,
         CASE WHEN length(media_ref) % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
         repeat('media:' || media_ref, length(media_ref) % 5 + 1) AS payload_str
  FROM refs),
h AS (
  SELECT doc_id, media_ref, kind,
         length(payload_str)::BIGINT AS payload_bytes,
         kind || lower(to_hex(encode(payload_str))) AS base
  FROM p),
x AS (
  SELECT doc_id, media_ref, kind, payload_bytes,
         sha256(base) || sha256(base || chr(1)) AS hex128
  FROM h),
f AS (
  SELECT doc_id, media_ref, kind, payload_bytes,
         list_transform(range(16),
           i -> round((('0x' || substr(hex128, (8*i+1)::INT, 8))::UBIGINT)::DOUBLE
                      / 4294967296.0, 6)) AS feats
  FROM x)
SELECT doc_id, media_ref, kind, payload_bytes,
       md5(array_to_string(list_transform(feats, x -> printf('%.6f', x)), ',')) AS feature_sig
FROM f ORDER BY doc_id, media_ref
"""


_CRAWL_MEMO: dict = {}


def _crawl_results(scale: str = "tiny", seed: int = 42):
    key = (scale, seed)
    if key not in _CRAWL_MEMO:
        from anansi_ray import fixtures
        from anansi_ray.pipelines.crawl import CrawlPipeline

        tables = fixtures.generate(scale, seed=seed)
        _CRAWL_MEMO[key] = CrawlPipeline(tables, CrawlConfig(), budget=None).run()
    return _CRAWL_MEMO[key]


def q_crawl_order(sf_dir: str):
    """The flagship: full crawl of the deterministic synthetic LOD web;
    returns the dequeue-order ledger (seq, clock, url, state, status).
    Conformance vs the reference-semantics oracle is asserted in
    tests/test_crawl_pipeline.py."""
    return _crawl_results()["expected_crawl"]


def q_crawl_status_mix(sf_dir: str):
    """Crawl observability crosstab: ledger row counts per (state,
    HTTP status class) — the at-a-glance health report every crawl
    operator watches (2xx/3xx mix, error rates per state).  Computed
    from the pipeline's own ledger; the SQL twin recomputes the crosstab
    from the INDEPENDENT reference-semantics crawl artifact, so any
    state-machine divergence breaks the hash."""
    led = _crawl_results()["expected_crawl"]
    state = np.asarray(led["state"].to_pylist(), dtype=object)
    status = led["status"].to_numpy(zero_copy_only=False).astype(np.int64)
    cls = status // 100
    import pandas as pd

    df = (
        pd.DataFrame({"state": state, "status_class": cls})
        .groupby(["state", "status_class"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["state", "status_class"], ignore_index=True)
    )
    return pa.table(
        {
            "state": pa.array(df["state"].to_numpy(dtype=object), pa.string()),
            "status_class": pa.array(
                df["status_class"].to_numpy(dtype=np.int64), pa.int64()
            ),
            "n": pa.array(df["n"].to_numpy(dtype=np.int64), pa.int64()),
        }
    )


SQL_CRAWL_STATUS_MIX = f"""
SELECT state, (status // 100)::BIGINT AS status_class, count(*)::BIGINT AS n
FROM read_parquet('{{od}}/crawl_order.parquet')
GROUP BY 1, 2 ORDER BY 1, 2
""".format(od=ORACLE_DIR)


def q_crawl_host_profile(sf_dir: str):
    """Politeness profile of the crawl ledger: per crawl_root (the
    politeness key, ≙ crawl_root db.c:279-338) the fetch count, the
    MINIMUM inter-fetch clock gap and the total clock span.  The min gap
    is the politeness invariant made value-comparable — the SQL twin
    computes the same profile over the INDEPENDENT reference-semantics
    crawl artifact, so a single politeness slip (one fetch scheduled
    inside another's rate window) breaks the hash.  Distributed shape:
    host stamp + ONE coarse hash exchange, vectorized per-run gap scan
    (single-fetch hosts report min_gap_ms = -1)."""
    ledger = _crawl_results()["expected_crawl"]

    def stamp(batch: pa.Table) -> pa.Table:
        import pandas as pd

        m = pc.extract_regex(
            pc.cast(batch["url"].combine_chunks(), pa.string()),
            r"^(?P<root>[a-z0-9+.-]+://[^/]+)",
        )
        h = pc.fill_null(pc.struct_field(m, "root"), "")
        # deterministic cross-process hash (same primitive as coarse_agg)
        part = (
            pd.util.hash_array(h.to_numpy(zero_copy_only=False)) % 8
        ).astype(np.int32)
        return pa.table(
            {
                "host": h,
                "clock": batch["fetch_clock_ms"].combine_chunks().cast(pa.int64()),
                "part": pa.array(part, pa.int32()),
            }
        )

    def profile(group: pa.Table) -> pa.Table:
        h = group["host"].to_numpy(zero_copy_only=False)
        c = group["clock"].to_numpy(zero_copy_only=False)
        order = np.lexsort((c, h))
        h, c = h[order], c[order]
        bounds = np.flatnonzero(np.r_[True, h[1:] != h[:-1], True])
        hosts, n, ming, span = [], [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            hosts.append(h[s])
            n.append(e - s)
            gaps = np.diff(c[s:e])
            ming.append(int(gaps.min()) if len(gaps) else -1)
            span.append(int(c[e - 1] - c[s]))
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "n_fetches": pa.array(n, pa.int64()),
                "min_gap_ms": pa.array(ming, pa.int64()),
                "span_ms": pa.array(span, pa.int64()),
            }
        )

    out = (
        rd.from_arrow(ledger)
        .map_batches(stamp, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda t: profile(t.drop_columns(["part"])), batch_format="pyarrow")
    )
    return _with_schema(
        out,
        _empty_tbl(
            {
                "host": pa.string(),
                "n_fetches": pa.int64(),
                "min_gap_ms": pa.int64(),
                "span_ms": pa.int64(),
            }
        ),
    )


def q_crawl_documents(sf_dir: str):
    """Interleaved text+media documents produced by the crawl (input_hint
    shape), projected to the hash-comparable per-row span-sequence
    invariant: span counts + md5 over the ordered (kind, text, media_ref,
    offset) sequence.  The nested-span table itself stays the pipeline
    product (_crawl_results()['documents']; span equality is additionally
    asserted in tests/test_crawl_pipeline.py) — this query is the value
    oracle surface over it."""
    from anansi_ray.functions.spans import flatten_spans_batch, span_sig_batch

    res = _crawl_results()["documents"]
    order = pc.sort_indices(res, sort_keys=[("doc_id", "ascending")])
    docs = res.take(order)
    flat = flatten_spans_batch(docs)
    sigs = span_sig_batch(docs)
    return pa.table(
        {
            "doc_id": flat["doc_id"],
            "n_spans": flat["n_spans"],
            "n_text_spans": flat["n_text_spans"],
            "n_media_spans": flat["n_media_spans"],
            "span_sig": sigs["span_sig"],
        }
    )


SQL_CRAWL_DOCUMENTS = f"""
SELECT doc_id, n_spans, n_text_spans, n_media_spans, span_sig
FROM read_parquet('{ORACLE_DIR}/crawl_docs_flat.parquet')
ORDER BY doc_id
"""


_MEDIA_TOKEN_COST = 64


def q_interleaved_token_budget(sf_dir: str):
    """Training-cost budget per interleaved document: text tokens (the
    token_count regex over the ordered text spans) plus a fixed
    ``_MEDIA_TOKEN_COST`` per media span — the number a packing/batching
    planner needs for mixed text+media sequences.  Computed from the
    crawl pipeline's own span table; the SQL twin recomputes the tokens
    INDEPENDENTLY from the reference-crawler artifact's flattened text."""
    from anansi_ray.functions.spans import flatten_spans_batch

    res = _crawl_results()["documents"]
    order = pc.sort_indices(res, sort_keys=[("doc_id", "ascending")])
    flat = flatten_spans_batch(res.take(order))
    n_tok = (
        pc.fill_null(
            pc.count_substring_regex(
                flat["text"], r"[A-Za-z0-9]+|[^\sA-Za-z0-9]"
            ),
            0,
        )
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    n_media = flat["n_media_spans"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "doc_id": flat["doc_id"],
            "n_text_tokens": pa.array(n_tok, pa.int64()),
            "n_media_spans": pa.array(n_media, pa.int64()),
            "budget": pa.array(
                n_tok + _MEDIA_TOKEN_COST * n_media, pa.int64()
            ),
        }
    )


SQL_INTERLEAVED_TOKEN_BUDGET = rf"""
SELECT doc_id,
       len(regexp_extract_all(coalesce(text, ''),
           '[A-Za-z0-9]+|[^\sA-Za-z0-9]'))::BIGINT AS n_text_tokens,
       n_media_spans,
       (len(regexp_extract_all(coalesce(text, ''),
            '[A-Za-z0-9]+|[^\sA-Za-z0-9]'))
        + 64 * n_media_spans)::BIGINT AS budget
FROM read_parquet('{ORACLE_DIR}/crawl_docs_flat.parquet')
ORDER BY doc_id
"""


def q_crawl_doc_pipeline(sf_dir: str):
    """End-to-end: crawl → interleaved spans → flatten → text quality +
    token counts + exact-dup fingerprint — the full 'crawl to training
    data' pipeline over the engine's own output.  ONE fused distributed
    pass: every per-doc kernel runs inside the same map_batches and the
    columns zip batch-locally (no triple pass, no driver merges)."""
    from anansi_ray.functions.spans import flatten_spans_batch

    docs = _crawl_results()["documents"]
    flat = flatten_spans_batch(docs)

    def fused(b: pa.Table) -> pa.Table:
        """ONE pass per batch: quality + token counts + fingerprint emitted
        alongside the span stats — the three kernels are row-aligned with
        the input, so the composition is a column zip, not a join."""
        q = ftext.quality_score_batch(b)
        t = ftext.token_count_batch(b)
        f = ftext.fingerprint_batch(b)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_spans": b["n_spans"],
                "n_text_spans": b["n_text_spans"],
                "n_media_spans": b["n_media_spans"],
                "n_chars": q["n_chars"],
                "punct_ratio": q["punct_ratio"],
                "stopword_ratio": q["stopword_ratio"],
                "mean_word_len": q["mean_word_len"],
                "n_tokens_ws": t["n_tokens_ws"],
                "n_tokens": t["n_tokens"],
                "fp_md5": f["fp_md5"],
            }
        )

    tbl = fdedup._collect_sorted(
        rd.from_arrow(flat).map_batches(fused, batch_format="pyarrow"),
        ["doc_id"],
    )
    if tbl is None:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_spans": pa.array([], pa.int64()),
                "n_text_spans": pa.array([], pa.int64()),
                "n_media_spans": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
                "punct_ratio": pa.array([], pa.float64()),
                "stopword_ratio": pa.array([], pa.float64()),
                "mean_word_len": pa.array([], pa.float64()),
                "n_tokens_ws": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "fp_md5": pa.array([], pa.string()),
            }
        )
    return tbl


def q_tfidf_top_terms(sf_dir: str):
    """TF-IDF top-3 terms per document with a BOUNDED broadcast vocabulary:
    pass 1 reuses the token_df combiner pipeline to pick the corpus's
    top-512 tokens by document frequency (a small, fixed-size table no
    matter the corpus size); pass 2 scores each doc against the broadcast
    vocab inside map_batches — tf · ln(N/df), per-doc top-3 by
    (score desc, token asc), all batch-local.  No token-level shuffle at
    any corpus size: the only exchange is the df groupby over per-batch
    vocabulary partials."""
    from anansi_ray.arrowds import coarse_agg

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()
    vocab_tbl = (
        coarse_agg(
            docs.map_batches(ftext.token_df_partial, batch_format="pyarrow"),
            "token",
            {"df": ("sum", "df")},
        )
        .sort(["df", "token"], descending=[True, False])
        .limit(512)
        .to_pandas()
    )
    vocab_tbl = _stable(vocab_tbl, {"token": "object", "df": "int64"})
    vocab_df = dict(zip(vocab_tbl["token"], vocab_tbl["df"].astype(int)))

    out = _stable(
        docs.map_batches(
            lambda b: ftext.tfidf_score_batch(b, vocab_df, n_docs, top_k=3),
            batch_format="pyarrow",
        ).to_pandas(),
        {
            "doc_id": "int64",
            "token": "object",
            "tf": "int64",
            "df": "int64",
            "score": "float64",
        },
    ).sort_values(["doc_id", "score", "token"], ascending=[True, False, True])
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_TFIDF_TOP_TERMS = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\w+')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dfreq AS (
  SELECT token, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1),
vocab AS (SELECT token, df FROM dfreq ORDER BY df DESC, token LIMIT 512),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, v.df,
         round(tf.tf * ln((SELECT count(*) FROM documents)::DOUBLE / v.df), 6)
           AS score
  FROM tf JOIN vocab v USING (token)),
ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, token
         ) AS rn
  FROM scored)
SELECT doc_id, token, tf, df, score FROM ranked WHERE rn <= 3
ORDER BY doc_id, score DESC, token
"""


def q_bm25_topk(sf_dir: str):
    """BM25 top-k retrieval (functions/bm25.py): two streaming passes —
    per-batch corpus-stats partials (one row each: n_docs, total length,
    per-query-term df) merged on the driver, then broadcast stats +
    vectorized scoring with per-batch partial top-k.  The query
    vocabulary is fixed and tiny, so nothing shuffles at any corpus
    size.  Full independent DuckDB twin (SQL_BM25_TOPK)."""
    from anansi_ray.functions import bm25 as fbm25

    return fbm25.bm25_topk(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_BM25_TOPK = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+'))
           AS tok
  FROM documents),
dl AS (
  SELECT d.doc_id, count(t.tok)::DOUBLE AS dl
  FROM documents d LEFT JOIN toks t ON d.doc_id = t.doc_id
  GROUP BY d.doc_id),
stats AS (
  SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
qterms(query_id, tok) AS (VALUES
  (1, 'hash'), (1, 'join'), (1, 'merge'),
  (2, 'window'), (2, 'sort'), (2, 'order'),
  (3, 'stream'), (3, 'batch'), (3, 'data')),
dfreq AS (
  SELECT tok, count(DISTINCT doc_id)::DOUBLE AS df
  FROM toks WHERE tok IN (SELECT tok FROM qterms) GROUP BY tok),
tf AS (
  SELECT t.doc_id, q.query_id, t.tok, count(*)::DOUBLE AS tf
  FROM toks t JOIN qterms q ON t.tok = q.tok
  GROUP BY t.doc_id, q.query_id, t.tok),
scores AS (
  SELECT tf.query_id, tf.doc_id,
         round(sum(ln((s.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))),
               6) AS score
  FROM tf
  JOIN dfreq ON tf.tok = dfreq.tok
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
  GROUP BY tf.query_id, tf.doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id
         ) AS "rank"
  FROM scores WHERE score > 0)
SELECT query_id, "rank", doc_id, score FROM ranked WHERE "rank" <= 10
ORDER BY query_id, "rank"
"""


_VC_THRESH = (16, 64, 256, 1024)


def q_token_zipf_fit(sf_dir: str):
    """Zipf-law fit of the token rank-frequency curve (the corpus
    statistic behind vocabulary sizing and quality sanity checks):
    least-squares slope of ln(freq) on ln(rank) over the top-512 tokens,
    plus R².  The distributed work is the value-counts combiner + ONE
    coarse exchange + per-block partial top-V (the vocab_coverage
    machinery); the fit runs on the bounded V-row table with ranks
    ordered (count desc, token asc) in both engines.  Full SQL twin."""
    import pandas as pd

    from anansi_ray.arrowds import coarse_agg

    V = 512
    spec = {
        "v_used": pa.int64(),
        "slope": pa.float64(),
        "intercept": pa.float64(),
        "r2": pa.float64(),
    }

    def tc_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(
                pc.fill_null(
                    batch["text"].combine_chunks().cast(pa.string()), ""
                )
            ),
            "[^a-z0-9]+",
        )
        flat = pc.list_flatten(toks).to_pandas().to_numpy(dtype=object)
        s = pd.Series(flat, dtype=object)
        vc = s[s != ""].value_counts()
        return pa.table(
            {
                "token": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "cnt": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    counts = coarse_agg(
        _read(sf_dir, "documents", ["text"]).map_batches(
            tc_partial, batch_format="pyarrow"
        ),
        "token",
        {"cnt": ("sum", "cnt")},
    ).materialize()

    def topv_partial(batch: pa.Table) -> pa.Table:
        c = batch["cnt"].to_numpy(zero_copy_only=False)
        t = batch["token"].to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((t, -c))[:V]
        return batch.take(pa.array(order))

    parts = counts.map_batches(topv_partial, batch_format="pyarrow").to_pandas()
    if len(parts) < 2:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    c = parts["cnt"].to_numpy(dtype=np.int64)
    t = parts["token"].to_numpy(dtype=str)
    order = np.lexsort((t, -c))[:V]
    freq = c[order].astype(np.float64)
    n = len(freq)
    if n < 2:
        return pa.table({c_: pa.array([], t_) for c_, t_ in spec.items()})
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(freq)
    sx, sy = x.sum(), y.sum()
    sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den
    intercept = (sy - slope * sx) / n
    ss_res = syy - 2 * slope * sxy - 2 * intercept * sy + slope * slope * sxx \
        + 2 * slope * intercept * sx + n * intercept * intercept
    ss_tot = syy - sy * sy / n
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
    return pa.table(
        {
            "v_used": pa.array([n], pa.int64()),
            "slope": pa.array([round(float(slope), 6)], pa.float64()),
            "intercept": pa.array([round(float(intercept), 6)], pa.float64()),
            "r2": pa.array([round(float(r2), 6)], pa.float64()),
        }
    )


SQL_TOKEN_ZIPF_FIT = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+'))
    AS tok
  FROM documents),
cnts AS (SELECT tok, count(*)::BIGINT AS cnt FROM toks GROUP BY tok),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rn FROM cnts
  QUALIFY rn <= 512),
xy AS (SELECT ln(rn::DOUBLE) AS x, ln(cnt::DOUBLE) AS y FROM ranked),
s AS (
  SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM xy),
fit AS (
  SELECT n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         sy, sx, sxx, syy, sxy
  FROM s WHERE n >= 2 AND n * sxx - sx * sx != 0),
f2 AS (
  SELECT n, slope, (sy - slope * sx) / n AS intercept,
         sxx, syy, sxy, sx, sy
  FROM fit)
SELECT n::BIGINT AS v_used,
       round(slope, 6) AS slope,
       round(intercept, 6) AS intercept,
       round(CASE WHEN syy - sy * sy / n > 0 THEN
               1.0 - (syy - 2 * slope * sxy - 2 * intercept * sy
                      + slope * slope * sxx
                      + 2 * slope * intercept * sx
                      + n * intercept * intercept)
                     / (syy - sy * sy / n)
             ELSE 0.0 END, 6) AS r2
FROM f2
"""


def q_logreg_cv(sf_dir: str):
    """Deterministic 3-fold cross-validation of the quality classifier
    (functions/logreg.py logreg_cv_distributed): folds by doc_id % 3,
    each fold a full distributed GD training run + one streaming
    accuracy-partial pass over the held-out fold.  Verified bit-for-bit
    vs the sequential twin the oracle builder materializes."""
    from anansi_ray.functions import logreg as flogreg

    return flogreg.logreg_cv_distributed(_docs_lr_mat(sf_dir))


def q_vocab_coverage(sf_dir: str):
    """Vocabulary coverage curve (tokenizer sizing): what share of the
    corpus token stream is covered by the top-V most frequent tokens, at
    V ∈ {16, 64, 256, 1024}.  Per-batch value-counts combiner → ONE
    coarse hash exchange (``coarse_agg``) → per-block partial top-Vmax +
    a distributed ``sum`` for the denominator → tiny driver merge.  The
    token stream itself never shuffles; driver traffic is
    O(blocks · Vmax) rows at any corpus size.  Ties at the V boundary
    break (count desc, token asc) in both engines."""
    import pandas as pd

    from anansi_ray.arrowds import coarse_agg

    docs = _read(sf_dir, "documents", ["text"])

    def tc_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(
                pc.fill_null(
                    batch["text"].combine_chunks().cast(pa.string()), ""
                )
            ),
            "[^a-z0-9]+",
        )
        flat = pc.list_flatten(toks).to_pandas().to_numpy(dtype=object)
        s = pd.Series(flat, dtype=object)
        vc = s[s != ""].value_counts()
        return pa.table(
            {
                "token": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "cnt": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    counts = coarse_agg(
        docs.map_batches(tc_partial, batch_format="pyarrow"),
        "token",
        {"cnt": ("sum", "cnt")},
    ).materialize()
    vmax = max(_VC_THRESH)

    def topv_partial(batch: pa.Table) -> pa.Table:
        c = batch["cnt"].to_numpy(zero_copy_only=False)
        t = batch["token"].to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((t, -c))[:vmax]
        return batch.take(pa.array(order))

    parts = counts.map_batches(topv_partial, batch_format="pyarrow").to_pandas()
    spec = {
        "v": pa.int64(),
        "covered": pa.int64(),
        "total": pa.int64(),
        "share": pa.float64(),
    }
    if len(parts) == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    total = int(counts.sum("cnt"))
    c = parts["cnt"].to_numpy(dtype=np.int64)
    t = parts["token"].to_numpy(dtype=str)
    order = np.lexsort((t, -c))
    csum = np.cumsum(c[order])
    rows = []
    for v in _VC_THRESH:
        covered = int(csum[min(v, len(csum)) - 1]) if len(csum) else 0
        rows.append((v, covered, total, round(covered / total, 6)))
    return pa.table(
        {
            "v": pa.array([r[0] for r in rows], pa.int64()),
            "covered": pa.array([r[1] for r in rows], pa.int64()),
            "total": pa.array([r[2] for r in rows], pa.int64()),
            "share": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def q_als_factors(sf_dir: str):
    """Distributed ALS matrix factorization (functions/als.py) over the
    implicit customer × part ratings (total quantity from orders ⨝
    lineitem).  Ratings build: bucketed co-partitioned join on orderkey +
    one coarse composite-key aggregation; training: ratings co-partition
    by user hash ONCE, then each iteration is a single streaming pass —
    user factors solved batch-locally (never materialized), item normal-
    equation partials merged centrally over the bounded part catalog.
    Verified bit-for-bit vs the sequential twin (independent DuckDB
    ratings build) the oracle builder materializes."""
    from anansi_ray.arrowds import coarse_agg
    from anansi_ray.functions import als as fals

    B = 32

    def tag_lineitem(b: pa.Table) -> pa.Table:
        key = b["l_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b["l_orderkey"].cast(pa.int64()),
                "bucket": pa.array((key % B).astype(np.int32), pa.int32()),
                "partkey": b["l_partkey"].cast(pa.int64()),
                "qty": b["l_quantity"].cast(pa.float64()),
                "custkey": pa.nulls(b.num_rows, pa.int64()),
                "side": pa.array(["l"] * b.num_rows, pa.string()),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        key = b["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b["o_orderkey"].cast(pa.int64()),
                "bucket": pa.array((key % B).astype(np.int32), pa.int32()),
                "partkey": pa.nulls(b.num_rows, pa.int64()),
                "qty": pa.nulls(b.num_rows, pa.float64()),
                "custkey": b["o_custkey"].cast(pa.int64()),
                "side": pa.array(["o"] * b.num_rows, pa.string()),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"]).map_batches(
        tag_lineitem, batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        tag_orders, batch_format="pyarrow"
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        left = df[df["side"] == "l"][["key", "partkey", "qty"]]
        right = df[df["side"] == "o"][["key", "custkey"]]
        merged = left.merge(right, on="key", how="inner")
        agg = merged.groupby(["custkey", "partkey"], as_index=False).agg(
            qty=("qty", "sum")
        )
        agg["custkey"] = agg["custkey"].astype("int64")
        agg["partkey"] = agg["partkey"].astype("int64")
        return pa.Table.from_pandas(agg, preserve_index=False)

    ratings = coarse_agg(
        li.union(orders)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow"),
        ["custkey", "partkey"],
        {"qty": ("sum", "qty")},
    )
    return fals.als_distributed(ratings)


def q_cms_counts(sf_dir: str):
    """Count-Min Sketch frequency estimates (functions/sketch.py): plain
    CMS is linear, so per-batch D×W integer partials merge EXACTLY —
    each batch forwards a few-KB matrix, the driver sums O(blocks)
    partials, nothing shuffles.  Probe tokens are reported with exact
    count next to the sketch estimate (CMS invariant: est ≥ exact).
    Full independent DuckDB twin rebuilds the same table cell-for-cell
    under the shared md5 bucket contract."""
    from anansi_ray.functions import sketch as fsketch

    return fsketch.cms_counts(_read(sf_dir, "documents", ["text"]))


SQL_CMS_COUNTS = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+'))
    AS tok
  FROM documents),
cnts AS (SELECT tok, count(*)::BIGINT AS c FROM toks GROUP BY tok),
probes(token) AS (VALUES
  ('a'), ('batch'), ('data'), ('hash'), ('join'), ('merge'),
  ('order'), ('sort'), ('stream'), ('the'), ('window'), ('zzz_absent')),
cells AS (
  SELECT d.d,
         ('0x' || substr(md5(d.d::VARCHAR || ':' || cnts.tok), 1, 8))::UBIGINT
           % 64 AS b,
         sum(cnts.c)::BIGINT AS cell
  FROM cnts, generate_series(0, 3) d(d)
  GROUP BY 1, 2),
probe_cells AS (
  SELECT p.token, d.d,
         ('0x' || substr(md5(d.d::VARCHAR || ':' || p.token), 1, 8))::UBIGINT
           % 64 AS b
  FROM probes p, generate_series(0, 3) d(d)),
est AS (
  SELECT pc.token, min(coalesce(cells.cell, 0))::BIGINT AS cms_est
  FROM probe_cells pc
  LEFT JOIN cells ON pc.d = cells.d AND pc.b = cells.b
  GROUP BY pc.token)
SELECT p.token,
       coalesce(cnts.c, 0)::BIGINT AS exact_cnt,
       est.cms_est
FROM probes p
LEFT JOIN cnts ON p.token = cnts.tok
JOIN est ON p.token = est.token
ORDER BY p.token
"""


SQL_VOCAB_COVERAGE = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+'))
    AS tok
  FROM documents),
cnts AS (SELECT tok, count(*)::BIGINT AS cnt FROM toks GROUP BY tok),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rn FROM cnts),
tot AS (SELECT sum(cnt)::BIGINT AS total FROM cnts),
v(v) AS (VALUES (16), (64), (256), (1024))
SELECT v.v,
       coalesce(sum(r.cnt) FILTER (WHERE r.rn <= v.v), 0)::BIGINT AS covered,
       tot.total,
       round(coalesce(sum(r.cnt) FILTER (WHERE r.rn <= v.v), 0)
             / tot.total::DOUBLE, 6) AS share
FROM v, ranked r, tot
GROUP BY v.v, tot.total
ORDER BY v.v
"""


#: memoized materialized LR corpus + trained weight vector per sf_dir —
#: shared by logreg_quality, logreg_auc-family and the curation
#: composition (full-batch GD is deterministic per corpus, so the weights
#: are a pure function of the data; _SIG_CACHE pattern)
_LR_DOCS_MEMO: dict[str, rd.Dataset] = {}
_LR_W_MEMO: dict[str, "np.ndarray | None"] = {}


def _docs_lr_mat(sf_dir: str) -> rd.Dataset:
    ds = _LR_DOCS_MEMO.get(sf_dir)
    if ds is None:
        ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"]).materialize()
        _LR_DOCS_MEMO[sf_dir] = ds
    return ds


def _logreg_weights(sf_dir: str):
    if sf_dir not in _LR_W_MEMO:
        from anansi_ray.functions import logreg as flogreg

        _LR_W_MEMO[sf_dir] = flogreg.logreg_train(_docs_lr_mat(sf_dir))
    return _LR_W_MEMO[sf_dir]


def q_logreg_quality(sf_dir: str):
    """Distributed logistic-regression training (functions/logreg.py):
    full-batch GD where each iteration is ONE streaming pass reducing
    every batch to a (dim+1)-vector gradient partial; the driver merges
    O(blocks) partials, applies the rounded weight update, re-broadcasts.
    Scoring is a final streaming pass.  Verified bit-for-bit vs the
    sequential twin the oracle builder materializes.  Weights memoized
    per process (_logreg_weights), shared with the curation chain."""
    import ray

    from anansi_ray.functions import logreg as flogreg

    w = _logreg_weights(sf_dir)
    if w is None:
        return flogreg._empty_out()
    wref = ray.put(w)
    out = (
        _docs_lr_mat(sf_dir)
        .map_batches(
            lambda b: flogreg._score_rows(b, ray.get(wref), "doc_id"),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def q_embedding_pca(sf_dir: str):
    """Distributed PCA eigen-spectrum of the embedding matrix
    (functions/pca.py): one streaming pass of O(dim²) covariance
    partials, driver-side eigendecomposition of the rounded dim×dim
    matrix.  Verified bit-for-bit vs the sequential twin the oracle
    builder materializes (rounded-covariance contract)."""
    from anansi_ray.functions import pca as fpca

    return fpca.pca_distributed(_read(sf_dir, "embeddings", ["embedding"]))


_CURATION_MEMO: dict[str, rd.Dataset] = {}

_CURATION_STAGES = ("gopher", "exact_dup", "near_dup", "quality", "kept")
_CURATION_KEPT = 4

_CURATION_EMPTY = pa.table(
    {"doc_id": pa.array([], pa.int64()), "verdict": pa.array([], pa.int64())}
)


def _curation_disposition_ds(sf_dir: str) -> rd.Dataset:
    """The distributed curation composition (shared by q_curation_pipeline
    and q_curation_funnel; memoized per sf_dir as a materialized Dataset
    of narrow (doc_id, verdict) rows that stays in the object store).

    Each stage emits a NARROW per-doc verdict stream
    ``(doc_id, verdict ∈ {stage_rank, KEPT=4})`` fully inside the cluster:

      0 ``gopher``    — the shared rule kernel, zero shuffle
      1 ``exact_dup`` — (doc_id, sha256-prefix hash) partials → ONE coarse
                        hash-keyed exchange; the partition kernel computes
                        per-hash min id and emits per-doc drop flags
      2 ``near_dup``  — MinHash-LSH pairs → distributed min-label
                        propagation (connected_components_labels, Dataset
                        form — no driver table)
      3 ``quality``   — GD-trained logreg weights broadcast once; scoring
                        is a streaming pass

    The four streams union into ONE doc_id-hash exchange whose partition
    kernel takes the per-doc MIN verdict — first-drop-wins in stage
    order.  Nothing of corpus cardinality reaches the driver: the only
    driver traffic is the logreg gradient partials, the CC changed-count
    scalars, and the callers' final query-boundary collect."""
    memo = _CURATION_MEMO.get(sf_dir)
    if memo is not None:
        return memo
    import pandas as pd
    import ray

    from anansi_ray.functions import logreg as flogreg
    from anansi_ray.functions.dedup import _auto_parts, _part_np

    docs_lr = _docs_lr_mat(sf_dir)
    n_docs = docs_lr.count()
    if n_docs == 0:
        empty = rd.from_arrow(_CURATION_EMPTY).materialize()
        _CURATION_MEMO[sf_dir] = empty
        return empty
    n_parts = _auto_parts(n_docs)
    kept = np.int64(_CURATION_KEPT)

    def _verdicts(ids, dropped: np.ndarray, rank: int) -> pa.Table:
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        v = np.where(dropped, np.int64(rank), kept)
        return pa.table(
            {"doc_id": ids.cast(pa.int64()), "verdict": pa.array(v, pa.int64())}
        )

    def gopher_partial(b: pa.Table) -> pa.Table:
        flags = _gopher_flags_part(b)
        keep = flags["keep"].to_numpy(zero_copy_only=False)
        return _verdicts(flags["doc_id"], keep == 0, 0)

    gopher = docs_lr.map_batches(gopher_partial, batch_format="pyarrow")

    def exact_partial(b: pa.Table) -> pa.Table:
        t = fdedup.text_hash_batch(b.select(["doc_id", "text"]))
        hs = t["text_hash"].to_pandas().to_numpy(dtype=object)
        part = (pd.util.hash_array(hs) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                "part": pa.array(part, pa.int32()),
                "doc_id": t["doc_id"].cast(pa.int64()),
                "text_hash": t["text_hash"],
            }
        )

    def exact_part_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _CURATION_EMPTY
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        hs = g["text_hash"].to_pandas().to_numpy(dtype=object)
        order = np.lexsort((ids, hs))
        h_s, id_s = hs[order], ids[order]
        new = np.r_[True, h_s[1:] != h_s[:-1]]
        keeper = id_s[np.flatnonzero(new)][np.cumsum(new) - 1]
        return _verdicts(pa.array(id_s, pa.int64()), id_s != keeper, 1)

    exact = (
        docs_lr.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(exact_part_kernel, batch_format="pyarrow")
    )

    cc = _minhash_cc_labels(sf_dir)

    def near_partial(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        grp = b["dup_group"].to_numpy(zero_copy_only=False)
        return _verdicts(b["doc_id"], grp != ids, 2)

    near = cc.map_batches(near_partial, batch_format="pyarrow")

    w = _logreg_weights(sf_dir)
    wref = ray.put(w)

    def qual_partial(b: pa.Table) -> pa.Table:
        scored = flogreg._score_rows(b, ray.get(wref), "doc_id")
        pred = scored["pred"].to_numpy(zero_copy_only=False)
        return _verdicts(scored["doc_id"], pred == 0, 3)

    qual = docs_lr.map_batches(qual_partial, batch_format="pyarrow")

    def tag_doc(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": _part_np(ids, n_parts),
                "doc_id": b["doc_id"],
                "verdict": b["verdict"],
            }
        )

    def first_drop_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _CURATION_EMPTY
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        v = g["verdict"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, ids))
        id_s, v_s = ids[order], v[order]
        starts = np.flatnonzero(np.r_[True, id_s[1:] != id_s[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(id_s[starts], pa.int64()),
                "verdict": pa.array(v_s[starts], pa.int64()),
            }
        )

    disp = (
        gopher.union(exact, near, qual)
        .map_batches(tag_doc, batch_format="pyarrow")
        .groupby("part")
        .map_groups(first_drop_part, batch_format="pyarrow")
        .materialize()
    )
    _CURATION_MEMO[sf_dir] = disp
    return disp


def q_curation_pipeline(sf_dir: str):
    """FLAGSHIP composition — the end-to-end LLM data-curation chain a
    user would actually run, as one per-doc disposition table: each doc
    is attributed to the FIRST stage that drops it
    (gopher → exact_dup → near_dup → quality → kept).

    Fully distributed end to end (see ``_curation_disposition_ds``): the
    four narrow verdict streams union into ONE doc_id-hash exchange with
    a first-drop-wins partition kernel; only the final disposition table
    leaves the cluster.  The SQL twin recomposes the chain from the
    INDEPENDENT stage twins (inline rule SQL + sha256 groups + the
    minhash-group and logreg artifacts)."""
    disp = _curation_disposition_ds(sf_dir)
    names = np.array(_CURATION_STAGES, dtype=object)

    def to_name(b: pa.Table) -> pa.Table:
        v = b["verdict"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "disposition": pa.array(names[v], pa.string()),
            }
        )

    tbl = fdedup._collect_sorted(
        disp.map_batches(to_name, batch_format="pyarrow"), ["doc_id"]
    )
    if tbl is None:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "disposition": pa.array([], pa.string()),
            }
        )
    return tbl


def q_curation_funnel(sf_dir: str):
    """The curation pipeline's funnel report: docs dropped per stage and
    the survival rate — the one-table summary a curation run publishes.
    Reuses the memoized disposition Dataset (no recompute of the chain):
    per-block 5-cell bincount partials, driver merge of O(blocks)·5
    rows."""
    disp = _curation_disposition_ds(sf_dir)
    spec = {
        "disposition": pa.string(),
        "n_docs": pa.int64(),
        "share": pa.float64(),
    }

    def cnt_partial(b: pa.Table) -> pa.Table:
        v = b["verdict"].to_numpy(zero_copy_only=False)
        c = np.bincount(v, minlength=5).astype(np.int64)
        return pa.table(
            {
                "verdict": pa.array(np.arange(5, dtype=np.int64), pa.int64()),
                "n": pa.array(c, pa.int64()),
            }
        )

    parts = disp.map_batches(cnt_partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    g = parts.groupby("verdict")["n"].sum()
    cnt = np.zeros(5, np.int64)
    cnt[g.index.to_numpy()] = g.to_numpy(dtype=np.int64)
    tot = int(cnt.sum())
    names = np.array(_CURATION_STAGES, dtype=object)
    order = np.argsort(names)
    names, cnt = names[order], cnt[order]
    nz = cnt > 0
    return pa.table(
        {
            "disposition": pa.array(names[nz], pa.string()),
            "n_docs": pa.array(cnt[nz], pa.int64()),
            "share": pa.array(
                np.round(cnt[nz].astype(np.float64) / tot, 6), pa.float64()
            ),
        }
    )


SQL_CURATION_PIPELINE = rf"""
WITH occ AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS tok
  FROM documents),
wc AS (SELECT doc_id, tok, count(*)::BIGINT AS c FROM occ GROUP BY 1, 2),
agg AS (
  SELECT doc_id,
         sum(c)::BIGINT AS n_words,
         sum(c * len(tok))::BIGINT AS sum_len,
         max(c)::BIGINT AS maxc,
         count(DISTINCT tok) FILTER (WHERE tok IN ('the', 'a'))::BIGINT
           AS stop_cnt
  FROM wc GROUP BY doc_id),
gopher AS (
  SELECT d.doc_id,
         (coalesce(a.n_words, 0) >= 5 AND coalesce(a.n_words, 0) <= 100000
          AND 3 * coalesce(a.n_words, 0) <= coalesce(a.sum_len, 0)
          AND coalesce(a.sum_len, 0) <= 10 * coalesce(a.n_words, 0)
          AND coalesce(a.stop_cnt, 0) >= 2
          AND 5 * coalesce(a.maxc, 0) <= coalesce(a.n_words, 0)
          AND 10 * len(regexp_replace(coalesce(d.text, ''),
                                      '[A-Za-z0-9\s]', '', 'g'))
              <= coalesce(a.n_words, 0))::INT AS keep
  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
fp AS (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY substr(sha256(text), 1, 32))
           AS keeper
  FROM documents),
grp AS (
  SELECT doc_id, dup_group
  FROM read_parquet('{ORACLE_DIR}/minhash_groups.parquet')),
qual AS (
  SELECT doc_id, pred FROM read_parquet('{ORACLE_DIR}/logreg.parquet'))
SELECT d.doc_id,
       CASE
         WHEN g.keep = 0 THEN 'gopher'
         WHEN d.doc_id != fp.keeper THEN 'exact_dup'
         WHEN grp.dup_group != d.doc_id THEN 'near_dup'
         WHEN qual.pred = 0 THEN 'quality'
         ELSE 'kept'
       END AS disposition
FROM documents d
JOIN gopher g ON g.doc_id = d.doc_id
JOIN fp ON fp.doc_id = d.doc_id
JOIN grp ON grp.doc_id = d.doc_id
JOIN qual ON qual.doc_id = d.doc_id
ORDER BY d.doc_id
"""


SQL_CURATION_FUNNEL = (
    "WITH d AS (" + SQL_CURATION_PIPELINE.replace("ORDER BY d.doc_id", "") + ") "
    "SELECT disposition, count(*)::BIGINT AS n_docs, "
    "round(count(*) * 1.0 / (SELECT count(*) FROM d), 6) AS share "
    "FROM d GROUP BY disposition ORDER BY disposition"
)


def q_seasonal_decompose(sf_dir: str):
    """Additive seasonal decomposition of event values: overall mean plus
    day-of-week and hour-of-day effects (mean_group − overall) — the
    means-based STL-lite every metrics pipeline runs before anomaly
    scoring.  Each batch reduces itself to ≤ 168 (dow, hour, sum, count)
    partial rows; nothing shuffles; full SQL twin (same Sunday=0 dow
    convention as DuckDB's ``dayofweek``)."""
    ev = _read(sf_dir, "events", ["ts", "value"])

    def part(b: pa.Table) -> pa.Table:
        from anansi_ray.arrowds import ts_us

        tv = ts_us(b["ts"].combine_chunks()).to_numpy(zero_copy_only=False)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        dow = ((tv // 86_400_000_000 + 4) % 7).astype(np.int64)
        hour = ((tv // 3_600_000_000) % 24).astype(np.int64)
        key = dow * 24 + hour
        uniq, inv = np.unique(key, return_inverse=True)
        s = np.bincount(inv, weights=v)
        c = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(uniq, pa.int64()),
                "s": pa.array(s, pa.float64()),
                "c": pa.array(c, pa.int64()),
            }
        )

    spec = {
        "component": pa.string(),
        "k": pa.int64(),
        "effect": pa.float64(),
    }
    parts = ev.map_batches(part, batch_format="pyarrow").to_pandas()
    if len(parts) == 0 or parts["c"].sum() == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    g = parts.groupby("key", sort=True).agg(s=("s", "sum"), c=("c", "sum"))
    keys = g.index.to_numpy(dtype=np.int64)
    s = g["s"].to_numpy()
    c = g["c"].to_numpy(dtype=np.float64)
    overall = float(s.sum() / c.sum())
    comps, ks, eff = ["overall"], [-1], [round(overall, 6)]
    for name, grp_key, n_groups in (("dow", keys // 24, 7), ("hour", keys % 24, 24)):
        for kk in range(n_groups):
            m = grp_key == kk
            if not m.any():
                continue
            comps.append(name)
            ks.append(kk)
            eff.append(round(float(s[m].sum() / c[m].sum()) - overall, 6))
    return pa.table(
        {
            "component": pa.array(comps, pa.string()),
            "k": pa.array(ks, pa.int64()),
            "effect": pa.array(eff, pa.float64()),
        }
    )


SQL_SEASONAL_DECOMPOSE = r"""
WITH base AS (
  SELECT dayofweek(ts)::BIGINT AS dow, hour(ts)::BIGINT AS hr, value
  FROM events),
ov AS (SELECT sum(value) / count(*) AS m FROM base)
SELECT 'overall' AS component, -1::BIGINT AS k,
       round((SELECT m FROM ov), 6) AS effect
FROM (SELECT 1) WHERE (SELECT count(*) FROM base) > 0
UNION ALL
SELECT 'dow', dow, round(sum(value) / count(*) - (SELECT m FROM ov), 6)
FROM base GROUP BY dow
UNION ALL
SELECT 'hour', hr, round(sum(value) / count(*) - (SELECT m FROM ov), 6)
FROM base GROUP BY hr
ORDER BY component, k
"""


_KM_DAY_US = 3_600_000_000  # "day" grain: 1 hour of event time (dense curve)


def q_kaplan_meier(sf_dir: str):
    """Kaplan–Meier time-to-first-purchase with right-censoring: a
    user's duration is floor((first purchase − first event)/hour); users
    who NEVER purchase are CENSORED at their observation end (they leave
    the risk set without counting as converted — the estimator's whole
    point).  S(t) = Π_{t'≤t} (1 − d_{t'}/n_{t'}) over event times,
    multiplied in ascending-t order in BOTH engines (the SQL twin uses a
    recursive-CTE running product, so the doubles are bit-identical
    before rounding).

    Scale shape: ONE coarse user-keyed exchange for per-user (first
    event, first purchase, last event) — per-batch combiner first — then
    a per-batch (duration, censored) histogram partial bounded by the
    time-grain range; the KM fold runs on the tiny histogram."""
    from anansi_ray.arrowds import coarse_agg

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    SENT = np.iinfo(np.int64).max

    def per_batch(b: pa.Table) -> pa.Table:
        from anansi_ray.arrowds import ts_us

        us = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tv = ts_us(b["ts"].combine_chunks()).to_numpy(zero_copy_only=False)
        is_p = pc.equal(
            b["event_type"].combine_chunks().cast(pa.string()), "purchase"
        ).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(us, return_inverse=True)
        mn = np.full(len(uniq), SENT, np.int64)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, np.int64)
        fp = np.full(len(uniq), SENT, np.int64)
        np.minimum.at(mn, inv, tv)
        np.maximum.at(mx, inv, tv)
        if is_p.any():
            np.minimum.at(fp, inv[is_p], tv[is_p])
        return pa.table(
            {
                "user_id": pa.array(uniq, pa.int64()),
                "mn": pa.array(mn, pa.int64()),
                "mx": pa.array(mx, pa.int64()),
                "fp": pa.array(fp, pa.int64()),
            }
        )

    peru = coarse_agg(
        ev.map_batches(per_batch, batch_format="pyarrow"),
        "user_id",
        {"mn": ("min", "mn"), "mx": ("max", "mx"), "fp": ("min", "fp")},
    ).materialize()
    spec = {
        "t_day": pa.int64(),
        "n_risk": pa.int64(),
        "n_events": pa.int64(),
        "survival": pa.float64(),
    }
    if peru.count() == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})

    def hist_partial(b: pa.Table) -> pa.Table:
        mn = b["mn"].to_numpy(zero_copy_only=False)
        mx = b["mx"].to_numpy(zero_copy_only=False)
        fp = b["fp"].to_numpy(zero_copy_only=False)
        purchased = fp != SENT
        end = np.where(purchased, fp, mx)
        t = (end - mn) // _KM_DAY_US
        cens = (~purchased).astype(np.int64)
        key = t * 2 + cens
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "t": pa.array(uniq // 2, pa.int64()),
                "cens": pa.array(uniq % 2, pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        peru.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["t", "cens"], as_index=False)["c"]
        .sum()
        .sort_values("t", ignore_index=True)
    )
    g = hist.groupby("t", sort=True)
    ts = np.array(sorted(g.groups), np.int64)
    d = np.array(
        [int(grp[grp["cens"] == 0]["c"].sum()) for _, grp in g], np.int64
    )
    allc = np.array([int(grp["c"].sum()) for _, grp in g], np.int64)
    n_risk = np.cumsum(allc[::-1])[::-1]
    keep = d > 0
    surv = np.cumprod(1.0 - d[keep] / n_risk[keep])
    return pa.table(
        {
            "t_day": pa.array(ts[keep], pa.int64()),
            "n_risk": pa.array(n_risk[keep], pa.int64()),
            "n_events": pa.array(d[keep], pa.int64()),
            "survival": pa.array(np.round(surv, 6), pa.float64()),
        }
    )


SQL_KAPLAN_MEIER = r"""
WITH RECURSIVE peru AS (
  SELECT user_id,
         min(epoch_us(ts))::BIGINT AS mn,
         max(epoch_us(ts))::BIGINT AS mx,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)::BIGINT
           AS fp
  FROM events GROUP BY user_id),
lt AS (
  SELECT (coalesce(fp, mx) - mn) // 3600000000 AS t,
         (fp IS NULL)::INT AS cens
  FROM peru),
agg AS (
  SELECT t,
         sum(CASE WHEN cens = 0 THEN 1 ELSE 0 END)::BIGINT AS d,
         count(*)::BIGINT AS allc
  FROM lt GROUP BY t),
risk AS (
  SELECT t, d,
         sum(allc) OVER (
           ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         )::BIGINT AS n_risk
  FROM agg),
steps AS (
  SELECT t, d, n_risk,
         row_number() OVER (ORDER BY t) AS rn
  FROM risk WHERE d > 0),
km AS (
  SELECT rn, t, n_risk, d, 1.0 - d * 1.0 / n_risk AS s
  FROM steps WHERE rn = 1
  UNION ALL
  SELECT st.rn, st.t, st.n_risk, st.d, km.s * (1.0 - st.d * 1.0 / st.n_risk)
  FROM steps st JOIN km ON st.rn = km.rn + 1)
SELECT t AS t_day, n_risk, d AS n_events, round(s, 6) AS survival
FROM km ORDER BY t_day
"""


_ATTR_CHANNELS = ["click", "error", "signup", "view"]


def q_user_burstiness(sf_dir: str):
    """Per-user temporal burstiness B = (σ−μ)/(σ+μ) over inter-event
    gaps (Goh & Barabási's burstiness index: −1 regular, 0 Poisson, →1
    bursty) — the behavioural-timing signal bots and humans separate on.
    One user-hash co-partition exchange; per-partition vectorized gap
    moments from INTEGER microsecond sums (σ and μ are exact rationals
    of integer sums, so both engines compute identical doubles); float
    only at the final sqrt/ratio, rounded 6.  Full SQL twin."""
    import math

    B = 32
    spec = {
        "user_id": pa.int64(),
        "n_gaps": pa.int64(),
        "mean_gap_s": pa.float64(),
        "burstiness": pa.float64(),
    }

    def tag(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((u % B).astype(np.int32), pa.int32()),
                "user_id": pa.array(u, pa.int64()),
                "ts": b["ts"],
                "event_id": b["event_id"].cast(pa.int64()),
            }
        )

    def kernel(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sg": pa.array([], pa.int64()),
                "sgg_hi": pa.array([], pa.int64()),
                "sgg_lo": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        gs = g.take(order)
        u = gs["user_id"].to_numpy(zero_copy_only=False)
        t = ts_us(gs["ts"].combine_chunks()).to_numpy(zero_copy_only=False)
        same = u[1:] == u[:-1]
        gap = (t[1:] - t[:-1])[same]
        gu = u[1:][same]
        if len(gap) == 0:
            return empty
        uniq, inv = np.unique(gu, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        sg = np.bincount(inv, weights=gap.astype(np.float64)).astype(np.int64)
        # exact Σgap² via limb decomposition (gap² overflows int64):
        # gap = a·1e6 + b  ⇒  gap² = a²·1e12 + 2ab·1e6 + b², each term and
        # its per-user sum int64-safe; assembled as big ints per USER
        a = gap // 1_000_000
        b_ = gap % 1_000_000
        saa = np.zeros(len(uniq), np.int64)
        sab = np.zeros(len(uniq), np.int64)
        sbb = np.zeros(len(uniq), np.int64)
        np.add.at(saa, inv, a * a)
        np.add.at(sab, inv, 2 * a * b_)
        np.add.at(sbb, inv, b_ * b_)
        sgg = [
            int(x) * 10**12 + int(y) * 10**6 + int(z)
            for x, y, z in zip(saa, sab, sbb)
        ]
        return pa.table(
            {
                "user_id": pa.array(uniq, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "sg": pa.array(sg, pa.int64()),
                "sgg_hi": pa.array([x // 10**9 for x in sgg], pa.int64()),
                "sgg_lo": pa.array([x % 10**9 for x in sgg], pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "events", ["event_id", "ts", "user_id"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .to_pandas()
    )
    if len(parts) == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    rows = []
    for r in parts.sort_values("user_id").itertuples():
        n, sg = int(r.n), int(r.sg)
        sgg = int(r.sgg_hi) * 10**9 + int(r.sgg_lo)
        if n < 2:
            continue
        mu = sg / n
        var = sgg / n - mu * mu
        sd = math.sqrt(var) if var > 0 else 0.0
        b_ = (sd - mu) / (sd + mu) if (sd + mu) > 0 else 0.0
        # mean gap reported at exact-µs resolution via INTEGER floor
        # division: an integer µs count over 1e6 sits on the 6-decimal
        # grid, so no cross-engine rounding tie can exist (a float mean
        # at exactly .5 µs hits Python half-even vs DuckDB half-away)
        rows.append((int(r.user_id), n, round((sg // n) / 1e6, 6), round(b_, 6)))
    if not rows:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "n_gaps": pa.array([r[1] for r in rows], pa.int64()),
            "mean_gap_s": pa.array([r[2] for r in rows], pa.float64()),
            "burstiness": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


SQL_USER_BURSTINESS = r"""
WITH e AS (
  SELECT user_id, epoch_us(ts)::BIGINT AS t,
         lag(epoch_us(ts)::BIGINT) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev
  FROM events),
g AS (SELECT user_id, (t - prev)::HUGEINT AS gap FROM e WHERE prev IS NOT NULL),
s AS (
  SELECT user_id, count(*)::BIGINT AS n, sum(gap)::HUGEINT AS sg,
         sum(gap * gap)::HUGEINT AS sgg
  FROM g GROUP BY user_id),
calc AS (
  SELECT user_id, n, sg::DOUBLE / n AS mu,
         sqrt(greatest(sgg::DOUBLE / n
                       - (sg::DOUBLE / n) * (sg::DOUBLE / n), 0)) AS sd
  FROM s WHERE n >= 2)
SELECT c.user_id, c.n AS n_gaps,
       round((s.sg // s.n) / 1000000, 6) AS mean_gap_s,
       round(CASE WHEN c.sd + c.mu > 0
             THEN (c.sd - c.mu) / (c.sd + c.mu) ELSE 0 END, 6)
         AS burstiness
FROM calc c JOIN s USING (user_id) ORDER BY c.user_id
"""


def q_markov_attribution(sf_dir: str):
    """Markov removal-effect attribution (functions/attribution.py): user
    journeys → absorbing-chain transition counts (one user-hash
    co-partition exchange, per-partition vectorized kernel, (S+3)²
    integer matrix partials) → driver-side removal-effect solve over the
    catalog-sized channel set.  Verified vs the sequential twin the
    oracle builder materializes (integer counts ⇒ identical solve)."""
    from anansi_ray.functions import attribution as fattr

    return fattr.markov_attribution_distributed(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]),
        _ATTR_CHANNELS,
    )


def q_benford_audit(sf_dir: str):
    """Benford first-digit audit of order prices (the classic
    fraud/data-quality screen): observed first-significant-digit counts
    vs the Benford expectation log10(1 + 1/d), with the χ² statistic.
    Each batch reduces itself to a 9-bin integer histogram; the digit is
    extracted SYMBOLICALLY (first char of the decimal rendering — the
    identical rule in both engines, no float log).  Full SQL twin."""

    def part(b: pa.Table) -> pa.Table:
        v = b["o_totalprice"].to_numpy(zero_copy_only=False)
        # first significant digit via the cents rendering (prices > 0)
        cents = np.round(v * 100).astype(np.int64)
        s = np.char.mod("%d", np.abs(cents))
        first = np.array([int(x[0]) for x in s], np.int64)
        keep = first > 0
        h = np.bincount(first[keep], minlength=10)[1:10]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10), pa.int64()),
                "n": pa.array(h.astype(np.int64), pa.int64()),
            }
        )

    spec = {
        "digit": pa.int64(),
        "n": pa.int64(),
        "share": pa.float64(),
        "benford": pa.float64(),
        "chi2_term": pa.float64(),
    }
    parts = (
        _read(sf_dir, "orders", ["o_totalprice"])
        .map_batches(part, batch_format="pyarrow")
        .to_pandas()
    )
    if len(parts) == 0 or parts["n"].sum() == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    g = parts.groupby("digit", sort=True)["n"].sum()
    n = g.to_numpy(dtype=np.float64)
    tot = n.sum()
    digits = np.arange(1, 10, dtype=np.float64)
    exp = np.log10(1.0 + 1.0 / digits)
    chi2 = (n - tot * exp) ** 2 / (tot * exp)
    return pa.table(
        {
            "digit": pa.array(np.arange(1, 10), pa.int64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
            "share": pa.array(np.round(n / tot, 6), pa.float64()),
            "benford": pa.array(np.round(exp, 6), pa.float64()),
            "chi2_term": pa.array(np.round(chi2, 6), pa.float64()),
        }
    )


SQL_BENFORD_AUDIT = r"""
WITH d AS (
  SELECT substr(abs(CAST(round(o_totalprice * 100) AS BIGINT))::VARCHAR, 1, 1)
           ::BIGINT AS digit
  FROM orders),
h AS (
  SELECT digit, count(*)::BIGINT AS n FROM d WHERE digit > 0 GROUP BY digit),
base AS (
  SELECT g.d AS digit, coalesce(h.n, 0)::BIGINT AS n,
         log10(1.0 + 1.0 / g.d) AS benford
  FROM generate_series(1, 9) g(d) LEFT JOIN h ON h.digit = g.d),
tot AS (SELECT sum(n)::DOUBLE AS t FROM base)
SELECT digit, n,
       round(n / tot.t, 6) AS share,
       round(benford, 6) AS benford,
       round((n - tot.t * benford) * (n - tot.t * benford)
             / (tot.t * benford), 6) AS chi2_term
FROM base, tot
WHERE tot.t > 0
ORDER BY digit
"""


def q_aqp_revenue_estimate(sf_dir: str):
    """Approximate query processing: estimate mean order price from a
    deterministic 10 % hash sample (md5 coin on the order key — the
    BlinkDB-style AQP recipe with a reproducible sample) next to the
    exact mean, with a Hoeffding 99 % half-width from the exact value
    range.  One streaming pass computes all partials (per-batch sums,
    counts, min/max, sample sums) — nothing shuffles; the sample is a
    pure function of the key, so the SQL twin draws the identical rows."""

    def part(b: pa.Table) -> pa.Table:
        import hashlib

        keys = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = b["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        # batched md5 coin: one vectorized decimal render, digests into a
        # single contiguous buffer (the stratified-sample rank-key shape —
        # no per-row hex strings)
        id_bytes = np.char.mod("%d", keys).astype("S").tolist()
        md5 = hashlib.md5
        buf = b"".join([md5(s).digest()[:4] for s in id_bytes])
        coin = np.frombuffer(buf, dtype=">u4").astype(np.int64) % 10
        samp = coin == 0
        return pa.table(
            {
                "n": pa.array([len(keys)], pa.int64()),
                "s": pa.array([float(price.sum())], pa.float64()),
                "mn": pa.array(
                    [float(price.min()) if len(price) else np.inf], pa.float64()
                ),
                "mx": pa.array(
                    [float(price.max()) if len(price) else -np.inf], pa.float64()
                ),
                "ns": pa.array([int(samp.sum())], pa.int64()),
                "ss": pa.array([float(price[samp].sum())], pa.float64()),
            }
        )

    spec = {
        "n_total": pa.int64(),
        "n_sample": pa.int64(),
        "exact_mean": pa.float64(),
        "sample_mean": pa.float64(),
        "abs_err": pa.float64(),
        "hoeffding_99": pa.float64(),
    }
    parts = (
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .map_batches(part, batch_format="pyarrow")
        .to_pandas()
    )
    if len(parts) == 0 or parts["n"].sum() == 0 or parts["ns"].sum() == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    n, s = float(parts["n"].sum()), float(parts["s"].sum())
    ns, ss = float(parts["ns"].sum()), float(parts["ss"].sum())
    rng = float(parts["mx"].max()) - float(parts["mn"].min())
    exact = s / n
    samp = ss / ns
    # Hoeffding: P(|mean_est - mean| > t) <= 2 exp(-2 ns t² / range²)
    hoeff = rng * np.sqrt(np.log(2.0 / 0.01) / (2.0 * ns))
    return pa.table(
        {
            "n_total": pa.array([int(n)], pa.int64()),
            "n_sample": pa.array([int(ns)], pa.int64()),
            "exact_mean": pa.array([round(exact, 6)], pa.float64()),
            "sample_mean": pa.array([round(samp, 6)], pa.float64()),
            "abs_err": pa.array([round(abs(samp - exact), 6)], pa.float64()),
            "hoeffding_99": pa.array([round(hoeff, 6)], pa.float64()),
        }
    )


SQL_AQP_REVENUE_ESTIMATE = r"""
WITH base AS (
  SELECT o_totalprice,
         (('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::UBIGINT % 10 = 0)
           AS in_sample
  FROM orders),
agg AS (
  SELECT count(*)::BIGINT AS n_total,
         sum(o_totalprice) AS s,
         max(o_totalprice) - min(o_totalprice) AS rng,
         count(*) FILTER (in_sample)::BIGINT AS n_sample,
         sum(o_totalprice) FILTER (in_sample) AS ss
  FROM base)
SELECT n_total, n_sample,
       round(s / n_total, 6) AS exact_mean,
       round(ss / n_sample, 6) AS sample_mean,
       round(abs(ss / n_sample - s / n_total), 6) AS abs_err,
       round(rng * sqrt(ln(2.0 / 0.01) / (2.0 * n_sample)), 6)
         AS hoeffding_99
FROM agg
WHERE n_total > 0 AND n_sample > 0
"""


def q_source_overlap_matrix(sf_dir: str):
    """Cross-source contamination matrix: for every source pair, the
    number of distinct 3-token shingles they share and the Jaccard
    overlap of their shingle sets — the corpus-mixing diagnostic that
    says which sources are near-copies of each other.

    Scale shape: per-batch distinct (shingle → source bitmask) combiner,
    ONE coarse hash exchange on the shingle, then each partition folds
    its shingles to a ≤2^|sources| distinct-mask histogram — the pair
    counting never touches individual shingles again; the driver merges
    O(parts · pairs) tiny rows.  |sources| is catalog-sized (≤64)."""
    P = 32

    src_parts = (
        _read(sf_dir, "documents", ["source"])
        .map_batches(
            lambda b: pa.table(
                {
                    "source": pa.array(
                        np.unique(
                            b["source"].to_numpy(zero_copy_only=False).astype(str)
                        ),
                        pa.string(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()  # ≤ |sources| rows per batch — a distinct combiner
    )
    srcs = sorted(set(src_parts["source"].astype(str))) if len(src_parts) else []
    spec = {
        "src_a": pa.string(),
        "src_b": pa.string(),
        "n_shared": pa.int64(),
        "n_a": pa.int64(),
        "n_b": pa.int64(),
        "jaccard": pa.float64(),
    }
    if len(srcs) < 2:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    import ray as _ray

    src_ref = _ray.put({s: i for i, s in enumerate(srcs)})

    def shingle_mask_partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        smap = _ray.get(src_ref)
        ridx, sh = ftext.shingles_for_batch(b, k=3)
        if not sh:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "sh": pa.array([], pa.string()),
                    "mask": pa.array([], pa.int64()),
                }
            )
        src = b["source"].to_numpy(zero_copy_only=False).astype(str)
        bits = np.array([np.int64(1) << smap[s] for s in src], np.int64)
        uniq, inv = np.unique(np.asarray(sh, dtype=str), return_inverse=True)
        masks = np.zeros(len(uniq), np.int64)
        np.bitwise_or.at(masks, inv, bits[ridx])
        h = pd.util.hash_array(uniq.astype(object))
        return pa.table(
            {
                "part": pa.array((h % P).astype(np.int32), pa.int32()),
                "sh": pa.array(uniq, pa.string()),
                "mask": pa.array(masks, pa.int64()),
            }
        )

    pair_empty = pa.table(
        {
            "i": pa.array([], pa.int64()),
            "j": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
        }
    )

    ns = len(srcs)

    def pair_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pair_empty
        sh = g["sh"].to_numpy(zero_copy_only=False).astype(str)
        m = g["mask"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(sh, return_inverse=True)
        masks = np.zeros(len(uniq), np.int64)
        np.bitwise_or.at(masks, inv, m)
        # distinct-mask histogram: pair counting over ≤2^ns mask values
        um, cnt = np.unique(masks, return_counts=True)
        oi, oj, oc = [], [], []
        for mask, c in zip(um, cnt):
            bits = [b for b in range(ns) if mask >> b & 1]
            for x in range(len(bits)):
                oi.append(bits[x])
                oj.append(bits[x])
                oc.append(int(c))  # diagonal: per-source distinct total
                for y in range(x + 1, len(bits)):
                    oi.append(bits[x])
                    oj.append(bits[y])
                    oc.append(int(c))
        return pa.table(
            {
                "i": pa.array(oi, pa.int64()),
                "j": pa.array(oj, pa.int64()),
                "c": pa.array(oc, pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "documents", ["source", "text"])
        .map_batches(shingle_mask_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_kernel, batch_format="pyarrow")
        .to_pandas()
    )
    if len(parts) == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    g = parts.groupby(["i", "j"], sort=True)["c"].sum()
    tot = {i: int(g.get((i, i), 0)) for i in range(ns)}
    # pairs only among shingle-bearing sources — the SQL twin's sz CTE
    # (built from the shingle set) has no row for a shingle-less source
    live = [i for i in range(ns) if tot[i] > 0]
    rows = []
    for xa in range(len(live)):
        for xb in range(xa + 1, len(live)):
            a, b_ = live[xa], live[xb]
            shared = int(g.get((a, b_), 0))
            union = tot[a] + tot[b_] - shared
            rows.append(
                (
                    srcs[a],
                    srcs[b_],
                    shared,
                    tot[a],
                    tot[b_],
                    round(shared / union, 6) if union else 0.0,
                )
            )
    return pa.table(
        {
            "src_a": pa.array([r[0] for r in rows], pa.string()),
            "src_b": pa.array([r[1] for r in rows], pa.string()),
            "n_shared": pa.array([r[2] for r in rows], pa.int64()),
            "n_a": pa.array([r[3] for r in rows], pa.int64()),
            "n_b": pa.array([r[4] for r in rows], pa.int64()),
            "jaccard": pa.array([r[5] for r in rows], pa.float64()),
        }
    )


SQL_SOURCE_OVERLAP_MATRIX = r"""
WITH w AS (
  SELECT source, regexp_extract_all(lower(coalesce(text, '')), '\w+') AS ws
  FROM documents),
g AS (
  SELECT DISTINCT source, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
  FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
sz AS (SELECT source, count(*)::BIGINT AS n FROM g GROUP BY 1),
inter AS (
  SELECT a.source AS sa, b.source AS sb, count(*)::BIGINT AS shared
  FROM g a JOIN g b ON a.sh = b.sh AND a.source < b.source
  GROUP BY 1, 2)
SELECT za.source AS src_a, zb.source AS src_b,
       coalesce(i.shared, 0)::BIGINT AS n_shared,
       za.n AS n_a, zb.n AS n_b,
       round(coalesce(i.shared, 0) * 1.0
             / (za.n + zb.n - coalesce(i.shared, 0)), 6) AS jaccard
FROM sz za
JOIN sz zb ON za.source < zb.source
LEFT JOIN inter i ON i.sa = za.source AND i.sb = zb.source
ORDER BY src_a, src_b
"""


def q_dup_group_size_hist(sf_dir: str):
    """Dedup reporting: histogram of MinHash near-dup component sizes
    (how much of the corpus sits in clusters of 2, 3, …) — the summary a
    curation run publishes next to its dedup rate.  Built on the fully
    distributed near-dup components; the histogram fold is TWO bounded
    coarse aggregations in the cluster — labels → per-group sizes
    (O(#groups) rows) → size histogram (O(#distinct sizes) rows) — so
    the corpus-cardinality label table never reaches the driver.  The
    SQL twin recomputes the histogram from the INDEPENDENT reference
    group artifact."""
    from anansi_ray.arrowds import coarse_agg

    labels = _minhash_cc_labels(sf_dir)
    sizes = coarse_agg(labels, "dup_group", {"group_size": ("count", "")})
    hist = coarse_agg(
        sizes, "group_size", {"n_groups": ("count", "")}, n_parts=8
    ).to_pandas()
    spec = {
        "group_size": pa.int64(),
        "n_groups": pa.int64(),
        "n_docs": pa.int64(),
    }
    if len(hist) == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    hist = hist.sort_values("group_size", ignore_index=True)
    gs = hist["group_size"].to_numpy(dtype=np.int64)
    ng = hist["n_groups"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "group_size": pa.array(gs, pa.int64()),
            "n_groups": pa.array(ng, pa.int64()),
            "n_docs": pa.array(gs * ng, pa.int64()),
        }
    )


SQL_DUP_GROUP_SIZE_HIST = f"""
WITH sizes AS (
  SELECT dup_group, count(*)::BIGINT AS sz
  FROM read_parquet('{ORACLE_DIR}/minhash_groups.parquet')
  GROUP BY dup_group)
SELECT sz AS group_size, count(*)::BIGINT AS n_groups,
       (sz * count(*))::BIGINT AS n_docs
FROM sizes GROUP BY sz ORDER BY sz
"""


def q_revenue_autocorr(sf_dir: str):
    """Lag-1..7 autocorrelation of the daily revenue series (the
    time-series diagnostic behind seasonality/forecast choices): daily
    sums via one bounded (day → sum) exchange, then the exact ACF on the
    tiny ordered series — r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²,
    computed over the contiguous day range with missing days as 0
    revenue in BOTH engines.  Full SQL twin."""
    spec = {"lag": pa.int64(), "acf": pa.float64()}

    def part(b: pa.Table) -> pa.Table:
        d = (
            ts_us(b["o_orderdate"].combine_chunks()).to_numpy(
                zero_copy_only=False
            )
            // 86_400_000_000
        )
        v = np.round(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        uniq, inv = np.unique(d, return_inverse=True)
        s = np.bincount(inv, weights=v.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "day": pa.array(uniq, pa.int64()),
                "cents": pa.array(s, pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(part, batch_format="pyarrow")
        .to_pandas()
    )
    if len(parts) == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    g = parts.groupby("day", sort=True)["cents"].sum()
    days = g.index.to_numpy(dtype=np.int64)
    full = np.arange(days.min(), days.max() + 1)
    x = np.zeros(len(full), np.float64)
    x[np.searchsorted(full, days)] = g.to_numpy(dtype=np.float64)
    n = len(x)
    if n < 8:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    xc = x - x.mean()
    denom = float((xc * xc).sum())
    lags = np.arange(1, 8)
    acf = [
        round(float((xc[:-k] * xc[k:]).sum()) / denom, 6) if denom > 0 else 0.0
        for k in lags
    ]
    return pa.table(
        {
            "lag": pa.array(lags.astype(np.int64), pa.int64()),
            "acf": pa.array(acf, pa.float64()),
        }
    )


SQL_REVENUE_AUTOCORR = r"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders GROUP BY 1),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
grid AS (
  SELECT g.d AS day, coalesce(daily.cents, 0)::DOUBLE AS v,
         row_number() OVER (ORDER BY g.d) AS t
  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM bounds) g
  LEFT JOIN daily ON daily.day = g.d),
m AS (SELECT avg(v) AS mu, count(*)::BIGINT AS n FROM grid),
c AS (SELECT t, v - (SELECT mu FROM m) AS xc FROM grid),
den AS (SELECT sum(xc * xc) AS d FROM c),
lags AS (SELECT k FROM generate_series(1, 7) s(k))
SELECT lags.k::BIGINT AS lag,
       round(
         (SELECT sum(a.xc * b.xc) FROM c a JOIN c b ON b.t = a.t + lags.k)
         / (SELECT d FROM den), 6) AS acf
FROM lags, m
WHERE m.n >= 8 AND (SELECT d FROM den) > 0
ORDER BY lag
"""


def _gopher_flags_part(b: pa.Table) -> pa.Table:
        """The Gopher rule kernel — per-doc integer rule flags + ``keep``.
        Module-level so q_gopher_rules and the curation disposition
        composition share one implementation (all-integer comparisons)."""
        n = b.num_rows
        col = pc.fill_null(b["text"].combine_chunks().cast(pa.string()), "")
        toks = pc.split_pattern_regex(col, r"\s+")
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(str)
        lens_l = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parents = np.repeat(np.arange(n), lens_l)
        keep_m = flat != ""
        flat, parents = flat[keep_m], parents[keep_m]
        n_words = np.bincount(parents, minlength=n).astype(np.int64)
        wl = np.char.str_len(flat).astype(np.int64) if len(flat) else np.array([], np.int64)
        sum_len = (
            np.bincount(parents, weights=wl.astype(np.float64), minlength=n)
            .astype(np.int64)
            if len(flat)
            else np.zeros(n, np.int64)
        )
        # max single-word repetition per doc (integer pair keys — numpy
        # U-dtype silently drops NUL separators, so never string-compose)
        maxc = np.zeros(n, np.int64)
        if len(flat):
            ut, tinv = np.unique(flat, return_inverse=True)
            pair = parents.astype(np.int64) * len(ut) + tinv
            upair, cnts = np.unique(pair, return_counts=True)
            np.maximum.at(maxc, upair // len(ut), cnts.astype(np.int64))
        # distinct stopwords present (of {'the', 'a'})
        stop_cnt = np.zeros(n, np.int64)
        for sw in ("the", "a"):
            hit = np.zeros(n, bool)
            if len(flat):
                hit[parents[flat == sw]] = True
            stop_cnt += hit.astype(np.int64)
        sym = (
            pc.utf8_length(
                pc.replace_substring_regex(col, r"[A-Za-z0-9\s]", "")
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        r_len = (n_words >= 5) & (n_words <= 100000)
        r_mwl = (3 * n_words <= sum_len) & (sum_len <= 10 * n_words)
        r_stop = stop_cnt >= 2
        r_rep = 5 * maxc <= n_words
        r_sym = 10 * sym <= n_words
        keep = r_len & r_mwl & r_stop & r_rep & r_sym
        mk = lambda a: pa.array(a.astype(np.int64), pa.int64())
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "n_words": mk(n_words),
                "r_len": mk(r_len),
                "r_mean_wl": mk(r_mwl),
                "r_stop": mk(r_stop),
                "r_repeat": mk(r_rep),
                "r_symbol": mk(r_sym),
                "keep": mk(keep),
            }
        )


def q_gopher_rules(sf_dir: str):
    """Gopher/MassiveText-style rule filter (Rae et al. 2021 §A1.1
    adapted to this corpus): per-doc named rule flags — word-count range,
    mean-word-length range, ≥2 distinct stopwords, max-word-repetition
    cap, symbol-to-word cap — and the conjunction ``keep``.  Every rule
    is an INTEGER comparison (e.g. mean-length ∈ [3,10] as
    ``3·n ≤ Σlen ≤ 10·n``), so both engines agree exactly with no float
    boundary.  One vectorized streaming pass (the kernel is the shared
    module-level ``_gopher_flags_part``); nothing shuffles."""
    out = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(_gopher_flags_part, batch_format="pyarrow")
        .to_pandas()
    )
    spec = {
        c: "int64"
        for c in (
            "doc_id n_words r_len r_mean_wl r_stop r_repeat r_symbol keep"
        ).split()
    }
    out = _stable(out, spec).sort_values("doc_id", ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_GOPHER_RULES = r"""
WITH occ AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS tok
  FROM documents),
wc AS (SELECT doc_id, tok, count(*)::BIGINT AS c FROM occ GROUP BY 1, 2),
agg AS (
  SELECT doc_id,
         sum(c)::BIGINT AS n_words,
         sum(c * len(tok))::BIGINT AS sum_len,
         max(c)::BIGINT AS maxc,
         count(DISTINCT tok) FILTER (WHERE tok IN ('the', 'a'))::BIGINT
           AS stop_cnt
  FROM wc GROUP BY doc_id),
base AS (
  SELECT d.doc_id,
         coalesce(a.n_words, 0) AS n_words,
         coalesce(a.sum_len, 0) AS sum_len,
         coalesce(a.maxc, 0) AS maxc,
         coalesce(a.stop_cnt, 0) AS stop_cnt,
         len(regexp_replace(coalesce(d.text, ''), '[A-Za-z0-9\s]', '', 'g'))
           ::BIGINT AS sym
  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
rules AS (
  SELECT doc_id, n_words,
         (n_words >= 5 AND n_words <= 100000)::BIGINT AS r_len,
         (3 * n_words <= sum_len AND sum_len <= 10 * n_words)::BIGINT
           AS r_mean_wl,
         (stop_cnt >= 2)::BIGINT AS r_stop,
         (5 * maxc <= n_words)::BIGINT AS r_repeat,
         (10 * sym <= n_words)::BIGINT AS r_symbol
  FROM base)
SELECT doc_id, n_words, r_len, r_mean_wl, r_stop, r_repeat, r_symbol,
       (r_len * r_mean_wl * r_stop * r_repeat * r_symbol)::BIGINT AS keep
FROM rules ORDER BY doc_id
"""


def q_cdc_chunk_dedup(sf_dir: str):
    """Content-defined-chunking dedup over the synthetic media corpus
    (functions/cdc.py): vectorized rolling-hash boundaries, block-local
    chunk hashing (payload bytes never shuffle), ONE coarse exchange on
    the chunk key, tiny stats reduction.  Verified value-exact vs the
    sequential twin the oracle builder materializes."""
    from anansi_ray.functions import cdc as fcdc
    from anansi_ray.functions import multimodal as fmedia2

    ds = rd.from_arrow(fmedia2.synthesize_media_table(n=256, seed=42))
    return fcdc.cdc_dedup_distributed(ds.repartition(8))


_PAD_BIN = 32


def q_padding_waste(sf_dir: str):
    """Training-efficiency padding report: bucket docs by token length
    into fixed 32-token bins and report, per bin, the padding fraction a
    naive pad-to-max batcher would waste (1 − Σlen / (n · max)).  The
    numbers that justify length-bucketed batching / sequence packing.
    Each batch reduces itself to ≤ |bins| partial rows (n, Σlen, max) —
    nothing shuffles; tiny driver merge.  Full SQL twin (same token regex
    as token_count)."""
    from anansi_ray.functions import text as _ftext

    def partial(b: pa.Table) -> pa.Table:
        n_tok = (
            _ftext.token_count_batch(b)["n_tokens"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        bins = n_tok // _PAD_BIN
        uniq, inv = np.unique(bins, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.bincount(inv, weights=n_tok.astype(np.float64)).astype(np.int64)
        mx = np.zeros(len(uniq), np.int64)
        np.maximum.at(mx, inv, n_tok)
        return pa.table(
            {
                "bin": pa.array(uniq, pa.int64()),
                "n_docs": pa.array(n, pa.int64()),
                "sum_tokens": pa.array(s, pa.int64()),
                "max_tokens": pa.array(mx, pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    spec = {
        "bin": pa.int64(),
        "n_docs": pa.int64(),
        "sum_tokens": pa.int64(),
        "max_tokens": pa.int64(),
        "waste": pa.float64(),
    }
    if len(parts) == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    g = parts.groupby("bin", sort=True).agg(
        n_docs=("n_docs", "sum"),
        sum_tokens=("sum_tokens", "sum"),
        max_tokens=("max_tokens", "max"),
    )
    n = g["n_docs"].to_numpy(dtype=np.float64)
    s = g["sum_tokens"].to_numpy(dtype=np.float64)
    mx = g["max_tokens"].to_numpy(dtype=np.float64)
    denom = np.maximum(n * mx, 1.0)
    waste = np.round(1.0 - s / denom, 6)
    return pa.table(
        {
            "bin": pa.array(g.index.to_numpy(dtype=np.int64), pa.int64()),
            "n_docs": pa.array(g["n_docs"].to_numpy(dtype=np.int64), pa.int64()),
            "sum_tokens": pa.array(
                g["sum_tokens"].to_numpy(dtype=np.int64), pa.int64()
            ),
            "max_tokens": pa.array(
                g["max_tokens"].to_numpy(dtype=np.int64), pa.int64()
            ),
            "waste": pa.array(waste, pa.float64()),
        }
    )


SQL_PADDING_WASTE = r"""
WITH t AS (
  SELECT len(regexp_extract_all(coalesce(text, ''),
             '[A-Za-z0-9]+|[^\sA-Za-z0-9]'))::BIGINT AS n_tokens
  FROM documents)
SELECT (n_tokens // 32)::BIGINT AS bin,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS sum_tokens,
       max(n_tokens)::BIGINT AS max_tokens,
       round(1.0 - sum(n_tokens)::DOUBLE
             / greatest(count(*) * max(n_tokens), 1), 6) AS waste
FROM t GROUP BY 1 ORDER BY 1
"""


def q_logreg_auc(sf_dir: str):
    """Exact ROC AUC of the trained classifier, computed distributed:
    train (functions/logreg.py GD loop), then ONE scoring pass where each
    batch reduces itself to a (rounded-prob → pos/neg counts) histogram
    partial — probabilities round to 1e-6, so the histogram is bounded at
    ~10^6 rows no matter the corpus size — one coarse exchange, then the
    exact rank-sum AUC on the merged histogram (ties get the standard 0.5
    credit).  The SQL twin recomputes AUC INDEPENDENTLY (window function
    over the logreg artifact).  Empty output when either class is absent
    (AUC undefined)."""
    import ray as _ray

    from anansi_ray.arrowds import coarse_agg
    from anansi_ray.functions import logreg as flogreg

    spec = {
        "n_pos": pa.int64(),
        "n_neg": pa.int64(),
        "auc": pa.float64(),
    }

    def _empty() -> pa.Table:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})

    ds = _docs_lr_mat(sf_dir)
    w = _logreg_weights(sf_dir)
    if w is None:
        return _empty()
    wref = _ray.put(w)

    def hist_partial(batch: pa.Table) -> pa.Table:
        w_ = _ray.get(wref)
        scored = flogreg._score_rows(batch, w_, "doc_id")
        p = scored["prob"].to_numpy(zero_copy_only=False)
        y = scored["label"].to_numpy(zero_copy_only=False)
        pk = np.round(p * 1e6).astype(np.int64)
        uniq, inv = np.unique(pk, return_inverse=True)
        npos = np.bincount(inv[y == 1], minlength=len(uniq)).astype(np.int64)
        nneg = np.bincount(inv[y == 0], minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(uniq, pa.int64()),
                "np": pa.array(npos, pa.int64()),
                "nn": pa.array(nneg, pa.int64()),
            }
        )

    hist = coarse_agg(
        ds.map_batches(hist_partial, batch_format="pyarrow"),
        "pk",
        {"np": ("sum", "np"), "nn": ("sum", "nn")},
    ).to_pandas()
    if len(hist) == 0:
        return _empty()
    hist = hist.sort_values("pk", ignore_index=True)
    npos = hist["np"].to_numpy(dtype=np.float64)
    nneg = hist["nn"].to_numpy(dtype=np.float64)
    P, N = npos.sum(), nneg.sum()
    if P == 0 or N == 0:
        return _empty()
    cum_neg_below = np.concatenate([[0.0], np.cumsum(nneg)[:-1]])
    auc = float(np.sum(npos * (cum_neg_below + 0.5 * nneg)) / (P * N))
    return pa.table(
        {
            "n_pos": pa.array([int(P)], pa.int64()),
            "n_neg": pa.array([int(N)], pa.int64()),
            "auc": pa.array([round(auc, 6)], pa.float64()),
        }
    )


def q_calibration_bins(sf_dir: str):
    """Classifier reliability diagram: 10 equal-width probability bins,
    each with (n, mean_prob, frac_pos).  Train + ONE scoring pass where
    each batch reduces itself to ≤10 bin-partial rows (count, prob sum,
    positive count) — nothing shuffles but 10-row partials.  SQL twin
    recomputes the bins INDEPENDENTLY from the logreg artifact."""
    import ray as _ray

    from anansi_ray.functions import logreg as flogreg

    spec = {
        "bin": pa.int64(),
        "n": pa.int64(),
        "mean_prob": pa.float64(),
        "frac_pos": pa.float64(),
    }
    ds = _docs_lr_mat(sf_dir)
    w = _logreg_weights(sf_dir)
    if w is None:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    wref = _ray.put(w)

    def bin_partial(batch: pa.Table) -> pa.Table:
        w_ = _ray.get(wref)
        scored = flogreg._score_rows(batch, w_, "doc_id")
        p = scored["prob"].to_numpy(zero_copy_only=False)
        y = scored["label"].to_numpy(zero_copy_only=False)
        b = np.minimum((p * 10).astype(np.int64), 9)
        n = np.bincount(b, minlength=10).astype(np.int64)
        psum = np.bincount(b, weights=p, minlength=10)
        pos = np.bincount(b[y == 1], minlength=10).astype(np.int64)
        return pa.table(
            {
                "bin": pa.array(np.arange(10), pa.int64()),
                "n": pa.array(n, pa.int64()),
                "psum": pa.array(psum, pa.float64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    parts = ds.map_batches(bin_partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    g = parts.groupby("bin", sort=True).sum()
    n = g["n"].to_numpy(dtype=np.float64)
    keep = n > 0
    bins = g.index.to_numpy(dtype=np.int64)[keep]
    nk = n[keep]
    return pa.table(
        {
            "bin": pa.array(bins, pa.int64()),
            "n": pa.array(nk.astype(np.int64), pa.int64()),
            "mean_prob": pa.array(
                np.round(g["psum"].to_numpy()[keep] / nk, 6), pa.float64()
            ),
            "frac_pos": pa.array(
                np.round(g["pos"].to_numpy(dtype=np.float64)[keep] / nk, 6),
                pa.float64(),
            ),
        }
    )


SQL_LOGREG_AUC = f"""
WITH s AS (
  SELECT prob, label FROM read_parquet('{ORACLE_DIR}/logreg.parquet')),
h AS (
  SELECT prob,
         sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)::DOUBLE AS np,
         sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)::DOUBLE AS nn
  FROM s GROUP BY prob),
o AS (
  SELECT np, nn,
         coalesce(sum(nn) OVER (
           ORDER BY prob ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS below
  FROM h)
SELECT (SELECT sum(np)::BIGINT FROM h) AS n_pos,
       (SELECT sum(nn)::BIGINT FROM h) AS n_neg,
       round(sum(np * (below + 0.5 * nn))
             / ((SELECT sum(np) FROM h) * (SELECT sum(nn) FROM h)), 6) AS auc
FROM o
HAVING (SELECT sum(np) FROM h) > 0 AND (SELECT sum(nn) FROM h) > 0
"""

SQL_CALIBRATION_BINS = f"""
WITH s AS (
  SELECT prob, label FROM read_parquet('{ORACLE_DIR}/logreg.parquet')),
b AS (
  SELECT least(floor(prob * 10)::BIGINT, 9) AS bin, prob, label FROM s)
SELECT bin,
       count(*)::BIGINT AS n,
       round(sum(prob) / count(*), 6) AS mean_prob,
       round(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS frac_pos
FROM b GROUP BY bin ORDER BY bin
"""


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    rankings — BM25 and raw query-term frequency — for the fixed query
    set: rrf(d) = Σ_r 1/(60 + rank_r(d)) over the rankings that retrieved
    d, re-ranked by (rrf desc, doc_id).  Both input rankings are the
    distributed partial-top-k shapes (corpus streams once per ranking,
    driver merges ≤ nq·k rows); the fusion itself runs on the bounded
    candidate union.  Full SQL twin rebuilds both rankings independently."""
    import ray as _ray

    from anansi_ray.functions import bm25 as fbm25

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()
    k = fbm25.BM25_TOPK
    a = fbm25.bm25_topk(docs, k=k).to_pandas()  # query_id, rank, doc_id

    # ranking B: integer query-term-frequency score, same partial-top-k shape
    q_ids = sorted(fbm25.BM25_QUERIES)
    q_sel = [
        np.array(
            [fbm25._VOCAB.index(t) for t in fbm25.BM25_QUERIES[q]], np.int64
        )
        for q in q_ids
    ]
    bref = _ray.put((q_ids, q_sel))

    def tf_partial(batch: pa.Table) -> pa.Table:
        q_ids_, q_sel_ = _ray.get(bref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, tf = fbm25._doc_term_counts(batch)
        out_q, out_d, out_s = [], [], []
        for qi, sel in zip(q_ids_, q_sel_):
            s = tf[:, sel].sum(axis=1).astype(np.int64)
            pos = np.flatnonzero(s > 0)
            if len(pos) == 0:
                continue
            order = pos[np.lexsort((ids[pos], -s[pos]))[:k]]
            out_q.append(np.full(len(order), qi, np.int64))
            out_d.append(ids[order])
            out_s.append(s[order])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "s": pa.array(np.concatenate(out_s), pa.int64()),
            }
        )

    b = docs.map_batches(tf_partial, batch_format="pyarrow").to_pandas()
    spec = {
        "query_id": pa.int64(),
        "rank": pa.int64(),
        "doc_id": pa.int64(),
        "rrf": pa.float64(),
    }
    scores: dict = {}
    for _, r in a.iterrows():
        scores.setdefault((int(r["query_id"]), int(r["doc_id"])), 0.0)
        scores[(int(r["query_id"]), int(r["doc_id"]))] += 1.0 / (
            60.0 + int(r["rank"])
        )
    if len(b):
        b = b.sort_values(["query_id", "s", "doc_id"], ascending=[True, False, True])
        b["r"] = b.groupby("query_id").cumcount() + 1
        for _, r in b[b["r"] <= k].iterrows():
            key = (int(r["query_id"]), int(r["doc_id"]))
            scores[key] = scores.get(key, 0.0) + 1.0 / (60.0 + int(r["r"]))
    if not scores:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    rows = sorted(
        ((q, d, round(w, 6)) for (q, d), w in scores.items()),
        key=lambda x: (x[0], -x[2], x[1]),
    )
    out_q, out_r, out_d, out_w = [], [], [], []
    last_q, rk = None, 0
    for q, d, w in rows:
        rk = rk + 1 if q == last_q else 1
        last_q = q
        if rk <= k:
            out_q.append(q)
            out_r.append(rk)
            out_d.append(d)
            out_w.append(w)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
            "rrf": pa.array(out_w, pa.float64()),
        }
    )


SQL_RRF_FUSION = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+'))
           AS tok
  FROM documents),
dl AS (
  SELECT d.doc_id, count(t.tok)::DOUBLE AS dl
  FROM documents d LEFT JOIN toks t ON d.doc_id = t.doc_id
  GROUP BY d.doc_id),
stats AS (
  SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
qterms(query_id, tok) AS (VALUES
  (1, 'hash'), (1, 'join'), (1, 'merge'),
  (2, 'window'), (2, 'sort'), (2, 'order'),
  (3, 'stream'), (3, 'batch'), (3, 'data')),
dfreq AS (
  SELECT tok, count(DISTINCT doc_id)::DOUBLE AS df
  FROM toks WHERE tok IN (SELECT tok FROM qterms) GROUP BY tok),
tf AS (
  SELECT t.doc_id, q.query_id, t.tok, count(*)::DOUBLE AS tf
  FROM toks t JOIN qterms q ON t.tok = q.tok
  GROUP BY t.doc_id, q.query_id, t.tok),
scores AS (
  SELECT tf.query_id, tf.doc_id,
         round(sum(ln((s.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))),
               6) AS score
  FROM tf
  JOIN dfreq ON tf.tok = dfreq.tok
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
  GROUP BY tf.query_id, tf.doc_id),
rank_a AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id
         ) AS r
  FROM scores WHERE score > 0),
tfsum AS (
  SELECT query_id, doc_id, sum(tf)::BIGINT AS s
  FROM tf GROUP BY 1, 2),
rank_b AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY s DESC, doc_id
         ) AS r
  FROM tfsum WHERE s > 0),
allr AS (
  SELECT query_id, doc_id, 1.0 / (60 + r) AS w FROM rank_a WHERE r <= 10
  UNION ALL
  SELECT query_id, doc_id, 1.0 / (60 + r) FROM rank_b WHERE r <= 10),
fused AS (
  SELECT query_id, doc_id, round(sum(w), 6) AS rrf
  FROM allr GROUP BY 1, 2)
SELECT query_id,
       row_number() OVER (
         PARTITION BY query_id ORDER BY rrf DESC, doc_id
       ) AS "rank",
       doc_id, rrf
FROM fused
QUALIFY "rank" <= 10
ORDER BY query_id, "rank"
"""


def q_dsir_weights(sf_dir: str):
    """DSIR importance weights (functions/dsir.py): hashed unigram+bigram
    bucket distributions for the target domain (lang = 'en') vs the raw
    corpus, Laplace-smoothed per-bucket log-ratio, per-doc log-weight =
    sum of ratios over its feature instances.  Fixed NB-bucket feature
    space ⇒ pass 1 is two NB-vectors per batch merged driver-side, pass 2
    a broadcast + bincount scoring pass — zero shuffle at any corpus
    size.  Full independent DuckDB twin (same md5-bucket contract)."""
    from anansi_ray.functions import dsir as fdsir

    return fdsir.dsir_weights(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    )


SQL_DSIR_WEIGHTS = r"""
WITH t AS (
  SELECT doc_id, lang,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS toks
  FROM documents),
uni AS (
  SELECT doc_id, lang, unnest(toks) AS f, generate_subscripts(toks, 1) AS i
  FROM t),
big AS (
  SELECT a.doc_id, a.lang, a.f || ' ' || b.f AS f
  FROM uni a JOIN uni b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
feats AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(f), 1, 8))::UBIGINT % 1024 AS b
  FROM (SELECT doc_id, lang, f FROM uni
        UNION ALL SELECT doc_id, lang, f FROM big)),
raw AS (SELECT b, count(*)::DOUBLE AS c FROM feats GROUP BY b),
tgt AS (SELECT b, count(*)::DOUBLE AS c FROM feats WHERE lang = 'en' GROUP BY b),
tot AS (
  SELECT (SELECT count(*) FROM feats)::DOUBLE AS nraw,
         (SELECT count(*) FROM feats WHERE lang = 'en')::DOUBLE AS ntgt),
lam AS (
  SELECT g.b,
         ln((coalesce(tgt.c, 0) + 1.0) / (tot.ntgt + 1024.0))
           - ln((coalesce(raw.c, 0) + 1.0) / (tot.nraw + 1024.0)) AS lam
  FROM generate_series(0, 1023) g(b)
  LEFT JOIN raw ON g.b = raw.b
  LEFT JOIN tgt ON g.b = tgt.b
  CROSS JOIN tot),
scored AS (
  SELECT feats.doc_id, count(*)::BIGINT AS n_feats,
         round(sum(lam.lam), 6) AS logw
  FROM feats JOIN lam ON feats.b = lam.b
  GROUP BY feats.doc_id)
SELECT d.doc_id,
       coalesce(s.n_feats, 0) AS n_feats,
       coalesce(s.logw, 0.0) AS logw
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
ORDER BY d.doc_id
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag corpus docs sharing any 8-token
    shingle with a held-out benchmark set (here: the 100 smallest doc_ids).
    The benchmark's shingle set is tiny and broadcast ONCE (``ray.put``);
    each batch probes its own shingles with one vectorized ``pc.is_in`` —
    the corpus's shingle stream never shuffles and never lands anywhere.
    Output: (doc_id, n_hits = distinct contaminated shingles) for
    contaminated non-benchmark docs."""
    import ray

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    bench_ids = set(
        r["doc_id"]
        for r in _read(sf_dir, "documents", ["doc_id"]).sort("doc_id").limit(100).take_all()
    )

    bench_tbl = docs.map_batches(
        lambda b: b.filter(pc.is_in(b["doc_id"], value_set=pa.array(sorted(bench_ids)))),
        batch_format="pyarrow",
    ).take_all()
    bench_sh: set[str] = set()
    for row_tbl in (pa.Table.from_pylist(bench_tbl),):
        _, sh = ftext.shingles_for_batch(row_tbl)
        bench_sh.update(sh)
    bench_ref = ray.put(pa.array(sorted(bench_sh), pa.string()))

    def probe(batch: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"doc_id": batch["doc_id"].slice(0, 0), "n_hits": pa.array([], pa.int64())}
        )
        bench_arr = ray.get(bench_ref)
        doc_idx, shingles = ftext.shingles_for_batch(batch)
        if not shingles:
            return empty
        hit = pc.is_in(pa.array(shingles, pa.string()), value_set=bench_arr).to_numpy(
            zero_copy_only=False
        )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = hit & ~np.isin(ids[doc_idx], list(bench_ids))
        if not keep.any():
            return empty
        hits = (
            pd.DataFrame(
                {"d": doc_idx[keep], "sh": np.asarray(shingles, dtype=object)[keep]}
            )
            .drop_duplicates()
            .groupby("d", sort=False)
            .size()
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(
                    pa.array(hits.index.to_numpy(), pa.int64())
                ),
                "n_hits": pa.array(hits.to_numpy(np.int64), pa.int64()),
            }
        )

    out = _stable(
        docs.map_batches(probe, batch_format="pyarrow").to_pandas(),
        {"doc_id": "int64", "n_hits": "int64"},
    ).sort_values("doc_id")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_DECONTAMINATE = r"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\w+') AS toks
  FROM documents),
pos AS (
  SELECT doc_id, toks, unnest(range(1, greatest(len(toks) - 6, 1))) AS i FROM d),
g AS (SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS sh FROM pos),
bench_ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 100),
bench AS (
  SELECT DISTINCT sh FROM g WHERE doc_id IN (SELECT doc_id FROM bench_ids)),
hits AS (
  SELECT g.doc_id, count(DISTINCT g.sh)::BIGINT AS n_hits
  FROM g JOIN bench USING (sh)
  WHERE g.doc_id NOT IN (SELECT doc_id FROM bench_ids)
  GROUP BY 1)
SELECT doc_id, n_hits FROM hits ORDER BY doc_id
"""


def q_quality_filter_p10(sf_dir: str):
    """Per-language p10 quality gate (drop each language's bottom decile by
    stopword ratio): score+lang-ID once into a tiny 3-column projection,
    reduce it to per-(lang, score-grid) histogram partials (combiner before
    the exchange — the same exact-quantile pattern as events_quantiles),
    read the p10 lower inverse-CDF per language on the driver (O(#langs)
    rows), then filter the projection against the broadcast thresholds.
    Scores are pre-rounded to 6 dp so the 1e-6 grid is exact — integer
    arithmetic end-to-end, no sketch tolerance."""
    import pandas as pd

    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def score_batch(batch: pa.Table) -> pa.Table:
        q = ftext.quality_score_batch(batch)
        lang = ftext.lang_id_batch(batch)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": lang["lang_pred"],
                "score": q["stopword_ratio"],
            }
        )

    # 3 narrow columns per doc — materialized once, read by both the
    # histogram pass and the filter pass (recomputing the kernels twice
    # would double the corpus read at scale)
    scored = docs.map_batches(score_batch, batch_format="pyarrow").materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        gv = np.rint(
            batch["score"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        la = batch["lang"].to_numpy(zero_copy_only=False)
        langs, linv = np.unique(la, return_inverse=True)
        gmin = gv.min() if len(gv) else 0
        span = int(gv.max() - gmin) + 1 if len(gv) else 1
        key, inv = np.unique(linv * span + (gv - gmin), return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        first = np.full(len(key), np.iinfo(np.int64).max)
        np.minimum.at(first, inv, np.arange(len(inv)))
        return pa.table(
            {
                "lang": pa.array(la[first], pa.string()),
                "gv": pa.array(gv[first], pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    hist = (
        scored.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["lang", "gv"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    hist = _stable(hist, {"lang": "object", "gv": "int64", "cnt": "int64"})
    thr: dict[str, int] = {}
    for lang, grp in hist.groupby("lang"):
        grp = grp.sort_values("gv")
        cum = grp["cnt"].cumsum().to_numpy()
        tot = int(cum[-1])
        target = int(np.ceil(0.1 * tot))
        thr[lang] = int(grp["gv"].to_numpy()[np.searchsorted(cum, target, side="left")])

    thr_langs = pa.array(sorted(thr), pa.string())
    thr_vals = np.array([thr[la] for la in sorted(thr)], np.int64)

    def keep_above(batch: pa.Table) -> pa.Table:
        gv = np.rint(
            batch["score"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        pos = pc.index_in(batch["lang"], thr_langs).to_numpy(zero_copy_only=False)
        bar = thr_vals[pos.astype(np.int64)]
        return batch.filter(pa.array(gv >= bar))

    out = _stable(
        scored.map_batches(keep_above, batch_format="pyarrow").to_pandas(),
        {"doc_id": "int64", "lang": "object", "score": "float64"},
    ).sort_values("doc_id")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_QUALITY_FILTER_P10 = rf"""
WITH lang_q AS ({SQL_LANG_ID}),
qual AS (
  SELECT doc_id,
         round(len(list_filter(string_split_regex(trim(text), '\s+'),
                               x -> x IN ('the','a','and','of','to','in')))
               / greatest(len(string_split_regex(trim(text), '\s+')), 1), 6)
           AS score
  FROM documents),
s AS (
  SELECT q.doc_id, l.lang_pred AS lang, q.score
  FROM qual q JOIN lang_q l USING (doc_id)),
ranked AS (
  SELECT lang, score,
         cume_dist() OVER (PARTITION BY lang ORDER BY score) AS cd
  FROM s),
thr AS (SELECT lang, min(score) AS bar FROM ranked WHERE cd >= 0.1 GROUP BY 1)
SELECT s.doc_id, s.lang, s.score
FROM s JOIN thr USING (lang)
WHERE s.score >= thr.bar
ORDER BY doc_id
"""


def q_pii_redact(sf_dir: str):
    """PII scrub over the corpus: emails → ``<EMAIL>``, then IPv4 literals →
    ``<IP>``, with per-doc match counts — two vectorized RE2 column scans
    per batch (text.py pii_redact_batch), zero shuffle at any corpus size.

    The synthetic corpus carries no PII, so a deterministic footer with one
    email + one IP derived from doc_id is appended on BOTH sides before
    redaction (same construction the URL-kernel queries use), making the
    redact path do real work the oracle can recompute."""

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        footer = pa.array(
            [
                f" contact user{d}@mail.example.com from 10.{d % 256}.0.{d % 100}"
                for d in ids
            ],
            pa.string(),
        )
        withpii = pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": pc.binary_join_element_wise(
                    pc.fill_null(batch["text"], ""), footer, ""
                ),
            }
        )
        return ftext.pii_redact_batch(withpii)

    out = _stable(
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(kernel, batch_format="pyarrow")
        .to_pandas(),
        {
            "doc_id": "int64",
            "clean_text": "object",
            "n_emails": "int64",
            "n_ips": "int64",
        },
    ).sort_values("doc_id")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_PII_REDACT = r"""
WITH pii AS (
  SELECT doc_id,
         coalesce(text, '') || ' contact user' || doc_id ||
           '@mail.example.com from 10.' || (doc_id % 256) || '.0.' ||
           (doc_id % 100) AS t
  FROM documents),
step1 AS (
  SELECT doc_id, t,
         regexp_replace(t, '[\w.+-]+@[\w-]+(\.[\w-]+)+', '<EMAIL>', 'g') AS s1
  FROM pii)
SELECT doc_id,
       regexp_replace(s1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
         AS clean_text,
       length(regexp_extract_all(t, '[\w.+-]+@[\w-]+(\.[\w-]+)+'))::BIGINT
         AS n_emails,
       length(regexp_extract_all(s1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT
         AS n_ips
FROM step1
ORDER BY doc_id
"""


def q_repetition_ratio(sf_dir: str):
    """Repetition-ratio quality signal: 1 − distinct/total tokens per doc
    (the boilerplate/spam detector every corpus-quality pass runs).
    Batch-local factorized counting (text.py repetition_batch), zero
    shuffle."""
    out = _stable(
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(ftext.repetition_batch, batch_format="pyarrow")
        .to_pandas(),
        {
            "doc_id": "int64",
            "n_tokens": "int64",
            "n_unique": "int64",
            "repetition": "float64",
        },
    ).sort_values("doc_id")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_REPETITION = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\w+')) AS token
  FROM documents),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
         count(DISTINCT token)::BIGINT AS n_unique
  FROM tok GROUP BY 1)
SELECT d.doc_id,
       coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(a.n_unique, 0)::BIGINT AS n_unique,
       round(CASE WHEN coalesce(a.n_tokens, 0) = 0 THEN 0
                  ELSE 1 - coalesce(a.n_unique, 0)::DOUBLE / a.n_tokens
             END, 6) AS repetition
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


def q_top_docs_per_lang(sf_dir: str):
    """Distributed top-k per group: the 3 longest docs per language by
    (n_chars desc, doc_id asc).

    Per-batch partial top-k (one lexsort + boundary mask — only ≤ k rows
    per (batch, lang) ever leave a block), then the bounded partial set
    (≤ k · |langs| · #blocks rows regardless of corpus size) reduces to the
    final top-k in one small driver step — the same partial-top-k shape as
    q_orders_topk/stratified_sample."""
    K = 3

    def partial_topk(b: pa.Table) -> pa.Table:
        langs = b["lang"].to_numpy(zero_copy_only=False)
        chars = b["n_chars"].to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -chars, langs))
        sl = langs[order]
        # rank within each lang run: position − run start
        starts = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1]])
        run_id = np.cumsum(np.r_[True, sl[1:] != sl[:-1]]) - 1
        rank = np.arange(len(sl)) - starts[run_id]
        keep = order[rank < K]
        return b.select(["lang", "doc_id", "n_chars"]).take(
            pa.array(np.sort(keep), pa.int64())
        )

    partials = (
        _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()
    )
    partials = _stable(
        partials, {"lang": "object", "doc_id": "int64", "n_chars": "int64"}
    )
    final = partials.sort_values(
        ["lang", "n_chars", "doc_id"], ascending=[True, False, True]
    )
    final["rank"] = final.groupby("lang", sort=False).cumcount() + 1
    final = final[final["rank"] <= K].astype({"rank": "int64"})
    return pa.Table.from_pandas(
        final[["lang", "doc_id", "n_chars", "rank"]], preserve_index=False
    )


SQL_TOP_DOCS_PER_LANG = """
WITH ranked AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id
         ) AS rank
  FROM documents)
SELECT lang, doc_id, n_chars, rank::BIGINT AS rank
FROM ranked WHERE rank <= 3
ORDER BY lang, rank
"""


def q_domain_mix_weights(sf_dir: str):
    """Corpus mixing weights per source domain: sqrt-count temperature
    weighting (the standard corpus-balancing recipe — upweight small
    sources, damp giant ones).

    Per-batch partial (source, n_docs, total_chars) combiner BEFORE the
    exchange, so the groupby moves ≤ |sources| rows per batch; the final
    normalization runs over the tiny |sources|-row result on the driver."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        src = b["source"].to_numpy(zero_copy_only=False)
        chars = b["n_chars"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        return pa.table(
            {
                "source": pa.array(uniq, pa.string()),
                "n_docs": pa.array(np.bincount(inv), pa.int64()),
                "total_chars": pa.array(
                    np.bincount(inv, weights=chars).astype(np.int64), pa.int64()
                ),
            }
        )

    g = (
        _read(sf_dir, "documents", ["source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"),
        )
        .to_pandas()
    )
    g = _stable(
        g, {"source": "object", "n_docs": "int64", "total_chars": "int64"}
    ).sort_values("source")
    sq = np.sqrt(g["n_docs"].to_numpy(np.float64))
    g["weight"] = np.round(sq / sq.sum(), 6)
    g = g.astype({"n_docs": "int64", "total_chars": "int64"})
    return pa.Table.from_pandas(
        g[["source", "n_docs", "total_chars", "weight"]], preserve_index=False
    )


SQL_DOMAIN_MIX = """
WITH g AS (
  SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars
  FROM documents GROUP BY 1)
SELECT source, n_docs, total_chars,
       round(sqrt(n_docs::DOUBLE) / sum(sqrt(n_docs::DOUBLE)) OVER (), 6)
         AS weight
FROM g ORDER BY source
"""


def q_customer_no_orders(sf_dir: str):
    """Distributed ANTI-join: customers with no 1-URGENT order, aggregated
    per market segment — the co-partitioned twin of q_order_lineitem_join's
    inner join (TPC-H Q22 shape).  Both sides bucket on hash(custkey) % B
    (ONE exchange), the right side is filter-pruned BEFORE the exchange,
    each bucket runs a vectorized isin anti-filter + per-segment partial
    aggregate, and only the ≤ |segments| · B partial rows reach the final
    combine."""
    B = 32

    def tag_customer(b: pa.Table) -> pa.Table:
        key = b["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b["c_custkey"],
                "bucket": pa.array((key % B).astype(np.int32), pa.int32()),
                "c_mktsegment": b["c_mktsegment"],
                "c_acctbal": b["c_acctbal"],
                "side": pa.array(["c"] * b.num_rows, pa.string()),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        # prune to the urgent orders BEFORE the exchange: only matching keys
        # ever shuffle
        b = b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
        key = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b["o_custkey"],
                "bucket": pa.array((key % B).astype(np.int32), pa.int32()),
                "c_mktsegment": pa.array([None] * b.num_rows, pa.string()),
                "c_acctbal": pa.array([None] * b.num_rows, pa.float64()),
                "side": pa.array(["o"] * b.num_rows, pa.string()),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"]).map_batches(
        tag_customer, batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        tag_orders, batch_format="pyarrow"
    )

    def anti_bucket(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        cmask = df["side"].to_numpy() == "c"
        lonely = df[cmask & ~df["key"].isin(df.loc[~cmask, "key"])]
        agg = lonely.groupby("c_mktsegment", as_index=False).agg(
            n_customers=("key", "size"), total_acctbal=("c_acctbal", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    from anansi_ray.arrowds import drop_empty_blocks

    # sort-based map_groups emits empty-schema blocks for empty range
    # partitions; strip them before the driver-side combine
    partials = drop_empty_blocks(
        cust.union(orders)
        .groupby("bucket")
        .map_groups(anti_bucket, batch_format="pyarrow")
        .materialize()
    ).to_pandas()
    partials = _stable(
        partials,
        {
            "c_mktsegment": "object",
            "n_customers": "int64",
            "total_acctbal": "float64",
        },
    )
    out = partials.groupby("c_mktsegment", as_index=False).agg(
        n_customers=("n_customers", "sum"), total_acctbal=("total_acctbal", "sum")
    )
    out["total_acctbal"] = out["total_acctbal"].round(2)
    out["n_customers"] = out["n_customers"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("c_mktsegment"), preserve_index=False
    )


SQL_CUSTOMER_NO_ORDERS = """
SELECT c_mktsegment,
       count(*)::BIGINT AS n_customers,
       round(sum(c_acctbal), 2) AS total_acctbal
FROM customer
WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY 1 ORDER BY 1
"""


def q_events_lag_lead(sf_dir: str):
    """SQL window-function family (row_number / lag / lead / delta) over
    (PARTITION BY user_id ORDER BY ts, event_id) as ONE co-partitioning
    exchange + a sorted run-boundary kernel (functions/events.py
    lag_lead_window).  Only exact ops, so the DuckDB twin matches
    bit-for-bit."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = _stable(
        fevents.lag_lead_window(ev).to_pandas(),
        {
            "event_id": "int64",
            "user_id": "int64",
            "rn": "int64",
            "prev_value": "float64",
            "next_value": "float64",
            "delta": "float64",
        },
    ).sort_values("event_id")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_EVENTS_LAG_LEAD = """
SELECT event_id, user_id,
       row_number() OVER w::BIGINT AS rn,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       round(value - lag(value) OVER w, 6) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


def q_distinct_users_exact(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type: per-batch (group, key)
    dedup combiner before the exchange, one pair-level groupby
    (functions/sketch.py distinct_count_exact) — the oracle-checkable twin
    of the HLL sketch below."""
    from anansi_ray.functions.sketch import distinct_count_exact

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return distinct_count_exact(ev, "user_id", "event_type")


SQL_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_distinct
FROM events GROUP BY 1 ORDER BY 1
"""


def q_approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate distinct users per event_type — the
    mergeable-sketch scale path for COUNT(DISTINCT) when the key stream is
    too large to shuffle: the exchange is bounded at |groups| · 2^12
    register rows per batch no matter the corpus size.  Register
    max-merge is commutative+idempotent, so the sequential one-slice twin
    the oracle builder materializes lands on the IDENTICAL registers —
    a full value oracle; accuracy vs the exact count is additionally
    pinned by pytest (±5 %)."""
    from anansi_ray.functions.sketch import approx_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return approx_distinct(ev, "user_id", "event_type")


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroid (the vector-aggregate building block of
    IVF training / cluster profiling): each batch reduces itself to a
    |labels| × (dim+1) partial (per-label coordinate sums + count) BEFORE
    the exchange — the kmeans partial shape — emitted long-form so the
    groupby moves ≤ |labels|·dim tiny rows per batch; mean + rounding
    happen in the final aggregate."""
    from ray.data.aggregate import Sum

    from anansi_ray.functions.clustering import _emb_matrix

    def partial(b: pa.Table) -> pa.Table:
        X = _emb_matrix(b, "embedding").astype(np.float64)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        dim = X.shape[1]
        sums = np.zeros((len(uniq), dim), np.float64)
        np.add.at(sums, inv, X)
        counts = np.bincount(inv).astype(np.int64)
        # long form: (label, i, sum_val, n) — 1-based i to match
        # generate_subscripts
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, dim), pa.int64()),
                "i": pa.array(np.tile(np.arange(1, dim + 1), len(uniq)), pa.int64()),
                "sum_val": pa.array(sums.ravel(), pa.float64()),
                "n": pa.array(np.repeat(counts, dim), pa.int64()),
            }
        )

    g = (
        _read(sf_dir, "embeddings", ["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "i"])
        .aggregate(Sum("sum_val", alias_name="sum_val"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    g = _stable(
        g, {"label": "int64", "i": "int64", "sum_val": "float64", "n": "int64"}
    ).sort_values(["label", "i"])
    g["mean_val"] = np.round(g["sum_val"] / g["n"], 6)
    g = g.astype({"label": "int64", "i": "int64", "n": "int64"})
    return pa.Table.from_pandas(
        g[["label", "i", "mean_val", "n"]], preserve_index=False
    )


SQL_LABEL_CENTROIDS = """
WITH u AS (
  SELECT label, generate_subscripts(embedding, 1) AS i,
         unnest(embedding) AS x
  FROM embeddings)
SELECT label::BIGINT AS label, i::BIGINT AS i,
       round(avg(x::DOUBLE), 6) AS mean_val, count(*)::BIGINT AS n
FROM u GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_text_normalize(sf_dir: str):
    """Corpus text normalization (the canonical pre-tokenization pass):
    Unicode NFC → lowercase → whitespace collapse → trim — batch-local,
    zero shuffle.  NFC runs through text.nfc_normalize_array (vectorized
    ASCII fast path; pyarrow's utf8_normalize does NOT compose in 16.x),
    the rest is Arrow kernels (utf8_lower + one RE2 scan).  A deterministic footer with a combining accent is
    appended on BOTH sides so the NFC step does real work the oracle can
    recompute (the synthetic corpus is ASCII)."""

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        footer = pa.array(
            [f"  Café Doc{d}\tEND " for d in ids], pa.string()
        )
        t = pc.binary_join_element_wise(
            pc.fill_null(batch["text"], ""), footer, ""
        )
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(ftext.nfc_normalize_array(t)), r"\s+", " "
            )
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "norm_text": norm,
                "n_chars_norm": pc.utf8_length(norm).cast(pa.int64()),
            }
        )

    out = _stable(
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(kernel, batch_format="pyarrow")
        .to_pandas(),
        {"doc_id": "int64", "norm_text": "object", "n_chars_norm": "int64"},
    ).sort_values("doc_id")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_TEXT_NORMALIZE = r"""
WITH t AS (
  SELECT doc_id,
         coalesce(text, '') || '  Cafe' || chr(769) || ' Doc' || doc_id ||
           chr(9) || 'END ' AS raw
  FROM documents)
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(raw)), '\s+', ' ', 'g'))
         AS norm_text,
       length(trim(regexp_replace(lower(nfc_normalize(raw)), '\s+', ' ', 'g')))::BIGINT
         AS n_chars_norm
FROM t
ORDER BY doc_id
"""


def q_order_lineitem_join_salted(sf_dir: str):
    """Skew-aware (salted) co-partitioned hash join — same result contract
    as q_order_lineitem_join, different exchange: hot probe-side keys are
    SPLIT across R salt replicas (so one hub key can't overload a single
    bucket task) and the matching build-side rows are REPLICATED to all R
    salts (FP-Hadoop-style skew handling).

    Heavy-hitter detection is itself distributed AND cheap: per-batch
    partial counts → ONE coarse 32-way hash exchange (never a sort over
    the ~unique key domain) → in-partition exact per-key combine, emitting
    only keys above 4× the partition-local mean count.  Because every
    occurrence of a key lands in one partition, the emitted counts are
    exact; the threshold being partition-local (≈ global under hash
    partitioning) is fine because salting is correctness-neutral — the
    join result is identical whatever the hot set, only the load balance
    changes.  Cold keys flow exactly like the unsalted join (salt 0), so
    the overhead is proportional to the skew, not the input."""
    R = 4  # salt replicas for hot keys
    B = 32

    li_keys = _read(sf_dir, "lineitem", ["l_orderkey"])

    def count_partial(b: pa.Table) -> pa.Table:
        k = b["l_orderkey"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(k, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uniq, pa.int64()),
                "bucket": pa.array((uniq % B).astype(np.int32), pa.int32()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    def hot_in_bucket(group: pa.Table) -> pa.Table:
        k = group["key"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(k, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, n)
        thresh = 4.0 * (tot.sum() / max(len(uniq), 1))
        hotk = uniq[tot > thresh]
        return pa.table({"key": pa.array(hotk, pa.int64())})

    hot_df = (
        li_keys.map_batches(count_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(hot_in_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    hot_df = _stable(hot_df, {"key": "int64"})
    import ray

    hot_ref = ray.put(
        np.sort(hot_df["key"].to_numpy().astype(np.int64))
    )

    def tag_lineitem(b: pa.Table) -> pa.Table:
        hot_arr = ray.get(hot_ref)
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        key = b["l_orderkey"].to_numpy(zero_copy_only=False)
        is_hot = np.isin(key, hot_arr)
        # deterministic spread of a hot key's rows across its R salts
        salt = np.where(
            is_hot, (np.arange(len(key), dtype=np.int64) % R), 0
        ).astype(np.int32)
        return pa.table(
            {
                "key": b["l_orderkey"],
                "bucket": pa.array(
                    ((key % B) * R + salt).astype(np.int32), pa.int32()
                ),
                "revenue": rev,
                "o_orderstatus": pa.array([None] * b.num_rows, pa.string()),
                "side": pa.array(["l"] * b.num_rows, pa.string()),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        hot_arr = ray.get(hot_ref)
        key = b["o_orderkey"].to_numpy(zero_copy_only=False)
        is_hot = np.isin(key, hot_arr)
        # cold rows → salt 0; hot build rows fan out to every salt replica
        reps = np.where(is_hot, R, 1).astype(np.int64)
        idx = np.repeat(np.arange(len(key), dtype=np.int64), reps)
        # within-row replica index, vectorized: position − own row's start
        starts = np.cumsum(reps) - reps
        salts = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(starts, reps)
        kk = key[idx]
        return pa.table(
            {
                "key": pa.array(kk, pa.int64()),
                "bucket": pa.array(
                    ((kk % B) * R + salts).astype(np.int32), pa.int32()
                ),
                "revenue": pa.array([None] * len(kk), pa.float64()),
                "o_orderstatus": b["o_orderstatus"].take(
                    pa.array(idx, pa.int64())
                ),
                "side": pa.array(["o"] * len(kk), pa.string()),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        tag_lineitem, batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]).map_batches(
        tag_orders, batch_format="pyarrow"
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        left = df[df["side"] == "l"][["key", "revenue"]]
        right = df[df["side"] == "o"][["key", "o_orderstatus"]]
        merged = left.merge(right, on="key", how="inner")
        agg = merged.groupby("o_orderstatus", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("revenue", "size")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    from anansi_ray.arrowds import drop_empty_blocks

    partials = drop_empty_blocks(
        li.union(orders)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
        .materialize()
    ).to_pandas()
    partials = _stable(
        partials,
        {"o_orderstatus": "object", "revenue": "float64", "n_items": "int64"},
    )
    out = partials.groupby("o_orderstatus", as_index=False).agg(
        revenue=("revenue", "sum"), n_items=("n_items", "sum")
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("o_orderstatus"), preserve_index=False
    )


def q_passage_dedup(sf_dir: str):
    """Corpus-wide passage dedup (C4/Gopher-style repeated-boilerplate
    removal): 10-word passages, keep the corpus-wide first occurrence of
    each distinct passage, reassemble surviving passages per document
    (functions/dedup.py passage_dedup — explode combiner → one
    groupby(chunk).min exchange whose min row IS the survivor → coarse
    partition-kernel reassembly)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = _stable(
        fdedup.passage_dedup(ds, chunk_words=10).to_pandas(),
        {"doc_id": "int64", "text": "object"},
    )
    return pa.Table.from_pandas(out.sort_values("doc_id"), preserve_index=False)


SQL_PASSAGE_DEDUP = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         unnest(range(len(string_split(text, ' ')))) AS i
  FROM documents),
c AS (SELECT doc_id, i // 10 AS ci, string_agg(word, ' ' ORDER BY i) AS chunk
      FROM w GROUP BY 1, 2),
k AS (SELECT doc_id, ci, chunk,
             row_number() OVER (PARTITION BY chunk
                ORDER BY lpad(doc_id::VARCHAR, 12, '0') || ':'
                         || lpad(ci::VARCHAR, 6, '0')) AS rn
      FROM c)
SELECT doc_id, string_agg(chunk, ' ' ORDER BY ci) AS text
FROM k WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id
"""


def q_bigram_topk(sf_dir: str):
    """Corpus-wide top-50 adjacent word pairs: per-batch vectorized
    bigram-count combiner (functions/text.py bigram_partial) → one
    coarse_agg hash exchange on the bigram string (never a sort over the
    vocabulary) → distributed sort + limit for the top-k (only 50 rows
    reach the driver)."""
    from anansi_ray.arrowds import coarse_agg

    ds = _read(sf_dir, "documents", ["text"])
    counts = coarse_agg(
        ds.map_batches(ftext.bigram_partial, batch_format="pyarrow"),
        "bigram",
        {"n": ("sum", "n")},
    )
    top = _stable(
        counts.sort(["n", "bigram"], descending=[True, False]).limit(50).to_pandas(),
        {"bigram": "object", "n": "int64"},
    )
    top["n"] = top["n"].astype("int64")
    return pa.Table.from_pandas(top, preserve_index=False)


SQL_BIGRAM_TOPK = """
WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
b AS (SELECT unnest(ws[1:len(ws)-1]) || ' ' || unnest(ws[2:len(ws)]) AS bigram FROM w)
SELECT bigram, count(*)::BIGINT AS n FROM b
GROUP BY 1 ORDER BY n DESC, bigram LIMIT 50
"""


def q_orders_running_total(sf_dir: str):
    """Global running total (SUM OVER (ORDER BY ...) window) as a
    distributed prefix scan (functions/scan.py ordered_prefix_sum):
    equal-count range boundaries from a tiny date histogram, per-part
    totals exclusive-scanned on the driver (n_parts values), ONE coarse
    exchange with block-local sorted cumsum.  Values are exact integer
    cents so the result is independent of summation order."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64()
        )
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_date_us": ts_us(b["o_orderdate"]),
                "cents": cents,
            }
        )

    from anansi_ray.functions.scan import ordered_prefix_sum

    out = ordered_prefix_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        range_col="o_date_us",
        order_cols=["o_date_us", "o_orderkey"],
        value_col="cents",
        keep_cols=["o_orderkey"],
        out_col="running_cents",
    ).to_pandas()
    out = _stable(out, {"o_orderkey": "int64", "running_cents": "int64"})
    return pa.Table.from_pandas(out.sort_values("o_orderkey"), preserve_index=False)


SQL_RUNNING_TOTAL = """
SELECT o_orderkey,
       (sum(CAST(round(o_totalprice * 100) AS BIGINT))
          OVER (ORDER BY o_orderdate, o_orderkey
                ROWS UNBOUNDED PRECEDING))::BIGINT AS running_cents
FROM orders ORDER BY o_orderkey
"""


def q_orders_ntile(sf_dir: str):
    """NTILE(4) over a global value order (price quartile per order)
    riding the distributed prefix scan: the global 1-based row position is
    ``ordered_prefix_sum`` of 1s over (cents, orderkey) — range-partitioned
    on the coarsened dollars key so the driver histogram stays
    catalog-sized even when the raw cents grid is huge — then the standard
    first-buckets-bigger tile formula maps positions to quartiles inside
    ``map_batches``.  One data exchange total; n comes from block
    metadata."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    n_total = ds.count()

    def prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64())
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "cents": cents,
                "dollars": pc.divide(cents, 100),
                "one": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
            }
        )

    from anansi_ray.functions.scan import ordered_prefix_sum

    K = 4
    base, rem = divmod(n_total, K)

    def to_tile(b: pa.Table) -> pa.Table:
        p = b["pos"].to_numpy(zero_copy_only=False) - 1  # 0-based position
        cut = rem * (base + 1)
        tile = np.where(p < cut, p // (base + 1), rem + (p - cut) // max(base, 1))
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "quartile": pa.array((tile + 1).astype(np.int64), pa.int64()),
            }
        )

    out = (
        ordered_prefix_sum(
            ds.map_batches(prep, batch_format="pyarrow"),
            range_col="dollars",
            order_cols=["dollars", "cents", "o_orderkey"],
            value_col="one",
            keep_cols=["o_orderkey"],
            out_col="pos",
        )
        .map_batches(to_tile, batch_format="pyarrow")
        .to_pandas()
    )
    out = _stable(out, {"o_orderkey": "int64", "quartile": "int64"})
    return pa.Table.from_pandas(out.sort_values("o_orderkey"), preserve_index=False)


SQL_ORDERS_NTILE = """
SELECT o_orderkey,
       ntile(4) OVER (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                      o_orderkey)::BIGINT AS quartile
FROM orders ORDER BY o_orderkey
"""


#: epoch-shuffle seed — part of the hash input, so a new epoch is a new
#: seed string and a completely different (but equally deterministic) order
_EPOCH_SEED = "ep42"


def q_epoch_shuffle(sf_dir: str):
    """Deterministic epoch shuffle (training-data ordering): every
    document's global position under a seeded portable shuffle key —
    ``md5("<doc_id>-<seed>")`` — computed as a distributed prefix scan of
    1s over the key order.  This is the shuffle a training run performs
    before sequence packing: seeded (reproducible across runs and engines,
    unlike ``random_shuffle``), and emitted as an (doc_id, pos) ordering
    map so the corpus text itself never moves — downstream stages reorder
    by joining/taking on ``pos``.

    Scale shape: the md5 digests land in one contiguous buffer per batch
    (no per-row hex strings); range partitioning uses the digest's top
    byte (256-bin histogram, catalog-sized driver state); ONE coarse
    exchange total via ``ordered_prefix_sum``; block-local uint64 sorts.
    Ordering by (hi, lo) big-endian words equals ordering by the hex
    digest the SQL twin uses (hex encoding is byte-monotone)."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id"])

    def prep(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        seeded = (
            np.char.add(np.char.mod("%d", ids), "-" + _EPOCH_SEED)
            .astype("S")
            .tolist()
        )
        md5 = hashlib.md5
        buf = b"".join([md5(s).digest() for s in seeded])
        dig = np.frombuffer(buf, dtype=">u8").reshape(-1, 2)
        hi = dig[:, 0].astype(np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "bin": pa.array((hi >> np.uint64(56)).astype(np.int64), pa.int64()),
                "k_hi": pa.array(hi, pa.uint64()),
                "k_lo": pa.array(dig[:, 1].astype(np.uint64), pa.uint64()),
                "one": pa.array(np.ones(len(ids), np.int64), pa.int64()),
            }
        )

    from anansi_ray.functions.scan import ordered_prefix_sum

    # parts are contiguous ranges of `bin` = the digest's top byte, so the
    # block-local (k_hi, k_lo) sort composes into the global digest order
    out = ordered_prefix_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        range_col="bin",
        order_cols=["k_hi", "k_lo", "doc_id"],
        value_col="one",
        keep_cols=["doc_id"],
        out_col="pos",
    ).to_pandas()
    out = _stable(out, {"doc_id": "int64", "pos": "int64"})
    return pa.Table.from_pandas(out.sort_values("doc_id"), preserve_index=False)


SQL_EPOCH_SHUFFLE = """
SELECT doc_id,
       (row_number() OVER (ORDER BY md5(doc_id::VARCHAR || '-ep42'), doc_id)
       )::BIGINT AS pos
FROM documents ORDER BY doc_id
"""


def q_corpus_mixture(sf_dir: str):
    """Deterministic mixture downsampling (training-data curation): cap
    every source at the corpus's mean source size *in expectation* by
    keeping a doc iff its seeded hash fraction clears the source's keep
    rate — ``md5("<doc_id>-mix-<source>")``'s first 32 bits compared to
    ``floor(2^32 · total / (2 · n_sources · n_source))`` (cap = HALF the
    mean source size, so the hash path binds even on a balanced corpus).  All-integer
    thresholds, so the SQL twin is bit-exact; re-running over a grown
    corpus keeps a surviving doc's verdict stable unless its own source's
    rate changed (the property reservoir sampling lacks).

    Scale shape: pass 1 is a per-batch source-count combiner (shuffle
    carries per-batch vocabularies, not rows); the O(#sources) threshold
    map is computed driver-side and probed block-locally with
    ``pc.index_in`` — the corpus itself never shuffles."""
    import hashlib

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def count_partial(b: pa.Table) -> pa.Table:
        src = np.asarray(b["source"].to_pylist(), dtype=object)
        uniq, counts = np.unique(src, return_counts=True)
        return pa.table(
            {
                "source": pa.array(uniq, pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts = _stable(counts, {"source": "object", "n": "int64"})
    sources = counts["source"].to_numpy()
    ns = counts["n"].to_numpy().astype(np.int64)
    total = int(ns.sum())
    n_sources = len(sources)
    # keep rate total/(S·n_s) as an exact 32-bit integer threshold
    thr = (np.int64(1 << 32) * total) // (2 * n_sources * ns)
    src_arr = pa.array(sources, pa.string())
    thr_arr = np.asarray(thr, dtype=np.int64)

    def keep(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        src = b["source"].combine_chunks()
        idx = pc.index_in(src, src_arr).to_numpy(zero_copy_only=False)
        t = thr_arr[idx]
        seeded = (
            np.char.add(
                np.char.add(np.char.mod("%d", ids), "-mix-"),
                np.asarray(src.to_pylist(), dtype="U"),
            )
            .astype("S")
            .tolist()
        )
        md5 = hashlib.md5
        buf = b"".join([md5(s).digest()[:4] for s in seeded])
        val = np.frombuffer(buf, dtype=">u4").astype(np.int64)
        mask = val < t
        return pa.table(
            {
                "doc_id": pa.array(ids[mask], pa.int64()),
                "source": src.filter(pa.array(mask)),
            }
        )

    out = _stable(
        ds.map_batches(keep, batch_format="pyarrow").to_pandas(),
        {"doc_id": "int64", "source": "object"},
    )
    return pa.Table.from_pandas(out.sort_values("doc_id"), preserve_index=False)


SQL_CORPUS_MIXTURE = """
WITH c AS (SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY 1),
     m AS (SELECT count(*)::BIGINT AS s, sum(n)::BIGINT AS total FROM c),
     t AS (SELECT c.source,
                  ((4294967296::BIGINT * m.total) // (2 * m.s * c.n))::BIGINT AS thr
           FROM c, m)
SELECT d.doc_id, d.source
FROM documents d JOIN t ON d.source = t.source
WHERE t.thr >= 4294967296
   OR substr(md5(d.doc_id::VARCHAR || '-mix-' || d.source), 1, 8)
        < printf('%08x', t.thr)
ORDER BY d.doc_id
"""


def q_lineitem_rollup(sf_dir: str):
    """Hierarchical (ROLLUP) aggregate: ONE distributed groupby at the
    finest grouping level; the coarser grouping sets are derived on the
    driver from that tiny finest-level table (|flags|×|statuses| rows) —
    zero extra exchanges, unlike a naive one-shuffle-per-grouping-set
    plan.  Exact: quantities are integer-valued, counts are ints."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    finest = (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    import pandas as pd

    finest = _stable(
        finest,
        {
            "l_returnflag": "object",
            "l_linestatus": "object",
            "sum_qty": "float64",
            "count_order": "int64",
        },
    )
    lvl1 = finest.groupby("l_returnflag", as_index=False).agg(
        sum_qty=("sum_qty", "sum"), count_order=("count_order", "sum")
    )
    lvl1["l_linestatus"] = "ALL"
    lvl0 = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            # SQL SUM over the empty grand-total grouping set is NULL
            "sum_qty": [finest["sum_qty"].sum() if len(finest) else None],
            "count_order": [finest["count_order"].sum()],
        }
    )
    out = pd.concat([finest, lvl1, lvl0], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "sum_qty", "count_order"]
    ]
    out["sum_qty"] = out["sum_qty"].round(2)
    out["count_order"] = out["count_order"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values(["l_returnflag", "l_linestatus"]), preserve_index=False
    )


SQL_LINEITEM_ROLLUP = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*)::BIGINT AS count_order
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY 1, 2
"""


def q_customer_order_profile(sf_dir: str):
    """LEFT OUTER join with null-fill (customer → 1995Q1 orders): the
    orders side pre-aggregates per custkey inside ``map_batches`` (a
    combiner, so the exchange carries one row per (batch, customer)),
    then BOTH sides co-partition on ``custkey % P`` and each partition
    kernel does one vectorized left merge + fillna — customers with no
    qualifying orders survive with (0, 0), which an inner join would
    drop.  No broadcast: at 100 TB both sides stream through the same
    uniform-key exchange."""
    import pandas as pd
    from ray.data.aggregate import Sum

    P = 32
    t0 = pa.scalar(np.datetime64("1995-01-01", "us"), pa.timestamp("us"))
    t1 = pa.scalar(np.datetime64("1995-04-01", "us"), pa.timestamp("us"))

    def orders_partial(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b["o_orderdate"], t0), pc.less(b["o_orderdate"], t1)
        )
        t = b.filter(m)
        k = t["o_custkey"].to_numpy(zero_copy_only=False)
        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(k, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, cents)
        return pa.table(
            {
                "c_custkey": pa.array(uniq, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "cents": pa.array(s, pa.int64()),
            }
        )

    from anansi_ray.arrowds import coarse_agg

    orders_agg = coarse_agg(
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(orders_partial, batch_format="pyarrow"),
        "c_custkey",
        {"n": ("sum", "n"), "cents": ("sum", "cents")},
    )

    def tag(side: str):
        def _tag(b: pa.Table) -> pa.Table:
            k = b["c_custkey"].combine_chunks().cast(pa.int64())
            kn = k.to_numpy(zero_copy_only=False)
            has = side == "o"
            return pa.table(
                {
                    "part": pa.array((kn % P).astype(np.int32), pa.int32()),
                    "c_custkey": k,
                    "n": b["n"] if has else pa.array(np.zeros(len(kn), np.int64)),
                    "cents": b["cents"] if has else pa.array(np.zeros(len(kn), np.int64)),
                    "side": pa.array([side] * len(kn), pa.string()),
                }
            )

        return _tag

    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        tag("c"), batch_format="pyarrow"
    )
    right = orders_agg.map_batches(tag("o"), batch_format="pyarrow")

    empty = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
            "sum_cents": pa.array([], pa.int64()),
        }
    )

    def join_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        df = group.to_pandas()
        left = df.loc[df["side"] == "c", ["c_custkey"]]
        r = df.loc[df["side"] == "o", ["c_custkey", "n", "cents"]]
        m = left.merge(r, on="c_custkey", how="left").fillna(0)
        return pa.table(
            {
                "c_custkey": pa.array(m["c_custkey"].astype("int64"), pa.int64()),
                "n_orders": pa.array(m["n"].astype("int64"), pa.int64()),
                "sum_cents": pa.array(m["cents"].astype("int64"), pa.int64()),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    out = (
        drop_empty_blocks(
            cust.union(right)
            .groupby("part")
            .map_groups(join_part, batch_format="pyarrow")
            .materialize()
        )
        .to_pandas()
    )
    out = _stable(
        out, {"c_custkey": "int64", "n_orders": "int64", "sum_cents": "int64"}
    ).sort_values("c_custkey")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_CUSTOMER_ORDER_PROFILE = """
SELECT c.c_custkey,
       count(o.o_orderkey)::BIGINT AS n_orders,
       coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)::BIGINT
         AS sum_cents
FROM customer c
LEFT JOIN (SELECT * FROM orders
           WHERE o_orderdate >= DATE '1995-01-01'
             AND o_orderdate <  DATE '1995-04-01') o
  ON c.c_custkey = o.o_custkey
GROUP BY 1 ORDER BY 1
"""


def q_orders_with_returns(sf_dir: str):
    """Distributed SEMI join (EXISTS): orders having ≥1 returned lineitem.
    The build side collapses to DISTINCT keys inside ``map_batches``
    (combiner) + one small groupby; both sides then co-partition on
    ``orderkey % P`` and each partition kernel keeps probe rows via one
    vectorized ``np.isin`` — no row multiplication, no broadcast (the
    build side can be arbitrarily large)."""
    P = 32

    def li_keys(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["l_returnflag"], "R"))
        k = np.unique(t["l_orderkey"].to_numpy(zero_copy_only=False))
        return pa.table({"k": pa.array(k, pa.int64())})

    build = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
        .map_batches(li_keys, batch_format="pyarrow")
        .groupby("k")
        .count()
    )

    def tag_build(b: pa.Table) -> pa.Table:
        k = b["k"].combine_chunks().cast(pa.int64())
        kn = k.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((kn % P).astype(np.int32), pa.int32()),
                "k": k,
                "o_orderstatus": pa.array([None] * len(kn), pa.string()),
                "side": pa.array(["b"] * len(kn), pa.string()),
            }
        )

    def tag_probe(b: pa.Table) -> pa.Table:
        kn = b["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((kn % P).astype(np.int32), pa.int32()),
                "k": b["o_orderkey"],
                "o_orderstatus": b["o_orderstatus"],
                "side": pa.array(["p"] * len(kn), pa.string()),
            }
        )

    probe = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]).map_batches(
        tag_probe, batch_format="pyarrow"
    )
    bd = build.map_batches(tag_build, batch_format="pyarrow")

    empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "o_orderstatus": pa.array([], pa.string()),
        }
    )

    def semi(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        side = group["side"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False)
        keys = k[side == "b"]
        pm = side == "p"
        keep = pm & np.isin(k, keys)
        t = group.filter(pa.array(keep))
        return pa.table(
            {"o_orderkey": t["k"], "o_orderstatus": t["o_orderstatus"]}
        )

    from anansi_ray.arrowds import drop_empty_blocks, stable_pandas

    out = _stable_t(
        stable_pandas(
            drop_empty_blocks(
                probe.union(bd)
                .groupby("part")
                .map_groups(semi, batch_format="pyarrow")
                .materialize()
            )
        ),
        empty,
    ).sort_values("o_orderkey")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_ORDERS_WITH_RETURNS = """
SELECT o_orderkey, o_orderstatus FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
ORDER BY o_orderkey
"""


def q_orders_price_histogram(sf_dir: str):
    """Fixed-width value-distribution histogram (data profiling): bin =
    floor(price / 10000) — the identical IEEE divide+floor on both
    engines — with a per-batch (bin → count, cents) combiner so the
    exchange carries at most |bins| rows per batch regardless of corpus
    size."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        v = b["o_totalprice"].to_numpy(zero_copy_only=False)
        bins = np.floor(v / 10000.0).astype(np.int64)
        cents = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(bins, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, cents)
        return pa.table(
            {
                "bin": pa.array(uniq, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "sum_cents": pa.array(s, pa.int64()),
            }
        )

    out = (
        _read(sf_dir, "orders", ["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
        .to_pandas()
    )
    out = _stable(
        out, {"bin": "int64", "n": "int64", "sum_cents": "int64"}
    ).sort_values("bin")
    out["n"] = out["n"].astype("int64")
    out["sum_cents"] = out["sum_cents"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_ORDERS_PRICE_HISTOGRAM = """
SELECT floor(o_totalprice / 10000)::BIGINT AS bin,
       count(*)::BIGINT AS n,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS sum_cents
FROM orders GROUP BY 1 ORDER BY 1
"""


def q_events_funnel(sf_dir: str):
    """Ordered funnel analysis (view → click → purchase): per user, the
    earliest view, the earliest click strictly after it, the earliest
    purchase strictly after that; output = users reaching each stage.

    Shape: events filter-pruned to the three stage types per batch BEFORE
    the exchange, then ONE co-partitioning exchange on ``user_id % P``;
    each partition kernel resolves all three stages vectorized (np.unique
    factorize + three ``np.minimum.at`` sweeps — the stage-k mask uses the
    stage-(k-1) min via one gather) and forwards only 3 partial-count rows,
    so the final exchange carries 3·P rows regardless of corpus size."""
    from ray.data.aggregate import Sum

    P = 32
    STAGES = ("view", "click", "purchase")

    def tag(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"], value_set=pa.array(STAGES))
        t = b.filter(m)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((u % P).astype(np.int32), pa.int32()),
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_type": t["event_type"],
            }
        )

    empty = pa.table(
        {
            "stage_idx": pa.array([], pa.int64()),
            "stage": pa.array([], pa.string()),
            "users": pa.array([], pa.int64()),
        }
    )

    def funnel_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = ts_us(g["ts"].combine_chunks()).to_numpy(zero_copy_only=False)
        et = np.asarray(g["event_type"].to_pylist())
        uniq, inv = np.unique(u, return_inverse=True)
        inf = np.iinfo(np.int64).max
        prev = None
        counts = []
        for stage in STAGES:
            t_min = np.full(len(uniq), inf, np.int64)
            m = et == stage
            if prev is not None:
                m &= ts > prev[inv]
            np.minimum.at(t_min, inv[m], ts[m])
            counts.append(int((t_min < inf).sum()))
            prev = t_min
        return pa.table(
            {
                "stage_idx": pa.array([0, 1, 2], pa.int64()),
                "stage": pa.array(list(STAGES), pa.string()),
                "users": pa.array(counts, pa.int64()),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    out = (
        drop_empty_blocks(
            _read(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(funnel_part, batch_format="pyarrow")
            .materialize()
        )
        .groupby(["stage_idx", "stage"])
        .aggregate(Sum("users", alias_name="users"))
        .to_pandas()
    )
    out = _stable(
        out, {"stage_idx": "int64", "stage": "object", "users": "int64"}
    ).sort_values("stage_idx")
    if len(out) == 0:
        # SQL twin on empty: each stage's COUNT-over-empty row survives
        import pandas as pd

        out = pd.DataFrame(
            {
                "stage_idx": np.arange(len(STAGES), dtype=np.int64),
                "stage": list(STAGES),
                "users": np.zeros(len(STAGES), np.int64),
            }
        )
    out["users"] = out["users"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_EVENTS_FUNNEL = """
WITH a AS (SELECT user_id, min(ts) AS ta FROM events
           WHERE event_type = 'view' GROUP BY 1),
b AS (SELECT e.user_id, min(e.ts) AS tb FROM events e
      JOIN a ON a.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > a.ta GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e
      JOIN b ON b.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > b.tb GROUP BY 1)
SELECT * FROM (
  SELECT 0::BIGINT AS stage_idx, 'view' AS stage,
         count(*)::BIGINT AS users FROM a
  UNION ALL
  SELECT 1, 'click', count(*) FROM b
  UNION ALL
  SELECT 2, 'purchase', count(*) FROM c
) ORDER BY stage_idx
"""


def q_customer_order_list(sf_dir: str):
    """Order-sensitive collect_list / string_agg: per customer, the
    comma-joined ascending list of their order keys.

    Shape: ONE co-partitioning exchange on ``o_custkey % P``; each
    partition kernel sorts once (np.lexsort), derives group offsets from
    run boundaries, and assembles every group's string in ONE vectorized
    ``pc.binary_join`` over a ListArray view (zero per-group Python).
    Output is one row per customer — the string build never touches the
    driver."""
    P = 32

    def tag(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((k % P).astype(np.int32), pa.int32()),
                "o_custkey": b["o_custkey"],
                "o_orderkey": b["o_orderkey"],
            }
        )

    empty = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "order_keys": pa.array([], pa.string()),
        }
    )

    def agg_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        cust = g["o_custkey"].to_numpy(zero_copy_only=False)
        okey = g["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, cust))
        cs, ks = cust[order], okey[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        offsets = np.r_[starts, len(cs)].astype(np.int32)
        strs = pc.cast(pa.array(ks, pa.int64()), pa.string())
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), strs)
        joined = pc.binary_join(lists, ",")
        return pa.table(
            {
                "o_custkey": pa.array(cs[starts], pa.int64()),
                "order_keys": joined,
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    out = (
        drop_empty_blocks(
            _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(agg_part, batch_format="pyarrow")
            .materialize()
        )
        .to_pandas()
    )
    out = _stable(
        out, {"o_custkey": "int64", "order_keys": "object"}
    ).sort_values("o_custkey")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_CUSTOMER_ORDER_LIST = """
SELECT o_custkey,
       string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey) AS order_keys
FROM orders GROUP BY 1 ORDER BY 1
"""


def q_lineitem_variance(sf_dir: str):
    """Exact integer population variance per return flag — the algebraic
    (n, Σx, Σx²) aggregate with an overflow-safe SPLIT-LIMB partial:
    Σcents² overflows int64 beyond ~90 M rows, so each batch forwards the
    square-sum as two int64 limbs (hi = Σ(x²//1e9), lo = Σ(x² mod 1e9))
    that the driver recombines into an exact Python int over the
    |flags|-row aggregate output.  Variance is then the exact floor
    division (n·Σx² − (Σx)²) // n², bit-equal to DuckDB's HUGEINT math."""
    from ray.data.aggregate import Sum

    LIMB = 10**9

    def partial(b: pa.Table) -> pa.Table:
        flag = np.asarray(b["l_returnflag"].to_pylist())
        cents = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        sq = cents * cents  # max ~1.1e14 per row: safely inside int64
        uniq, inv = np.unique(flag, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, cents)
        hi = np.zeros(len(uniq), np.int64)
        np.add.at(hi, inv, sq // LIMB)
        lo = np.zeros(len(uniq), np.int64)
        np.add.at(lo, inv, sq % LIMB)
        return pa.table(
            {
                "l_returnflag": pa.array(uniq, pa.string()),
                "n": pa.array(n, pa.int64()),
                "sum_cents": pa.array(s, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "lo": pa.array(lo, pa.int64()),
            }
        )

    agg = (
        _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("hi", alias_name="hi"),
            Sum("lo", alias_name="lo"),
        )
        .to_pandas()
    )
    agg = _stable(
        agg,
        {
            "l_returnflag": "object",
            "n": "int64",
            "sum_cents": "int64",
            "hi": "int64",
            "lo": "int64",
        },
    ).sort_values("l_returnflag")
    var = [
        (int(n) * (int(hi) * LIMB + int(lo)) - int(s) * int(s))
        // (int(n) * int(n))
        for n, s, hi, lo in zip(agg["n"], agg["sum_cents"], agg["hi"], agg["lo"])
    ]
    return pa.table(
        {
            "l_returnflag": pa.array(list(agg["l_returnflag"]), pa.string()),
            "n": pa.array([int(x) for x in agg["n"]], pa.int64()),
            "sum_cents": pa.array([int(x) for x in agg["sum_cents"]], pa.int64()),
            "var_cents2": pa.array(var, pa.int64()),
        }
    )


SQL_LINEITEM_VARIANCE = """
SELECT l_returnflag,
       count(*)::BIGINT AS n,
       sum(cc)::BIGINT AS sum_cents,
       ((count(*) * sum(cc * cc) - sum(cc) * sum(cc))
        // (count(*) * count(*)))::BIGINT AS var_cents2
FROM (SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cc
      FROM lineitem)
GROUP BY 1 ORDER BY 1
"""


def q_link_pagerank(sf_dir: str):
    """Integer-exact PageRank (3 iterations) over a deterministic link
    graph synthesized from doc_id — the iterative distributed-graph shape
    (rank exchange per superstep, edges partitioned once).  See
    functions/graph.py for the kernel; integer floor-division arithmetic
    makes both engines bit-equal with no float-order sensitivity."""
    from anansi_ray.functions.graph import pagerank_integer

    docs = _read(sf_dir, "documents", ["doc_id"])
    n_docs = docs.count()
    return pagerank_integer(docs, n_docs, iters=3)


def q_link_hits(sf_dir: str):
    """Integer-exact HITS hubs/authorities (2 alternating rounds) over
    the same deterministic link graph as link_pagerank — see
    functions/graph.py hits_integer: per-superstep one co-partitioned
    value exchange + integer bincount kernels, no float normalization,
    so the SQL twin is pure SQL and bit-equal."""
    from anansi_ray.functions.graph import hits_integer

    docs = _read(sf_dir, "documents", ["doc_id"])
    n_docs = docs.count()
    return hits_integer(docs, n_docs, rounds=2)


SQL_LINK_HITS = """
WITH e AS (
  SELECT doc_id AS src,
         (2 * doc_id + 1) % (SELECT count(*) FROM documents) AS dst
  FROM documents
  UNION ALL
  SELECT doc_id,
         (3 * doc_id + 7) % (SELECT count(*) FROM documents)
  FROM documents
),
h0 AS (SELECT doc_id, 1::BIGINT AS v FROM documents),
a1 AS (
  SELECT d.doc_id, coalesce(sum(h0.v), 0)::BIGINT AS v
  FROM documents d
  LEFT JOIN e ON e.dst = d.doc_id
  LEFT JOIN h0 ON h0.doc_id = e.src
  GROUP BY 1),
h1 AS (
  SELECT d.doc_id, coalesce(sum(a1.v), 0)::BIGINT AS v
  FROM documents d
  LEFT JOIN e ON e.src = d.doc_id
  LEFT JOIN a1 ON a1.doc_id = e.dst
  GROUP BY 1),
a2 AS (
  SELECT d.doc_id, coalesce(sum(h1.v), 0)::BIGINT AS v
  FROM documents d
  LEFT JOIN e ON e.dst = d.doc_id
  LEFT JOIN h1 ON h1.doc_id = e.src
  GROUP BY 1),
h2 AS (
  SELECT d.doc_id, coalesce(sum(a2.v), 0)::BIGINT AS v
  FROM documents d
  LEFT JOIN e ON e.src = d.doc_id
  LEFT JOIN a2 ON a2.doc_id = e.dst
  GROUP BY 1)
SELECT d.doc_id, h2.v AS hub, a2.v AS authority
FROM documents d
JOIN h2 ON h2.doc_id = d.doc_id
JOIN a2 ON a2.doc_id = d.doc_id
ORDER BY d.doc_id
"""


SQL_LINK_PAGERANK = """
WITH e AS (
  SELECT doc_id AS src,
         (2 * doc_id + 1) % (SELECT count(*) FROM documents) AS dst
  FROM documents
  UNION ALL
  SELECT doc_id,
         (3 * doc_id + 7) % (SELECT count(*) FROM documents)
  FROM documents
),
r0 AS (SELECT doc_id, 1000000000::BIGINT AS pr FROM documents),
r1 AS (
  SELECT d.doc_id,
         (150000000 + coalesce(sum((85 * (p.pr // 2)) // 100), 0))::BIGINT AS pr
  FROM documents d
  LEFT JOIN e ON e.dst = d.doc_id
  LEFT JOIN r0 p ON p.doc_id = e.src
  GROUP BY 1
),
r2 AS (
  SELECT d.doc_id,
         (150000000 + coalesce(sum((85 * (p.pr // 2)) // 100), 0))::BIGINT AS pr
  FROM documents d
  LEFT JOIN e ON e.dst = d.doc_id
  LEFT JOIN r1 p ON p.doc_id = e.src
  GROUP BY 1
),
r3 AS (
  SELECT d.doc_id,
         (150000000 + coalesce(sum((85 * (p.pr // 2)) // 100), 0))::BIGINT AS pr
  FROM documents d
  LEFT JOIN e ON e.dst = d.doc_id
  LEFT JOIN r2 p ON p.doc_id = e.src
  GROUP BY 1
)
SELECT doc_id, pr FROM r3 ORDER BY doc_id
"""


def q_link_components(sf_dir: str):
    """First-class distributed connected components (the dedup engine's
    cluster step exposed directly): chain edges (i, i+1) broken after
    i%7 ∈ {3, 6} give irregular-length runs whose true component label —
    the run's smallest id — has the closed form
    ``i − i%7 + (4 if i%7 ≥ 4 else 0)``, so the oracle is independent of
    the propagation mechanics.  Exercises
    ``connected_components_distributed`` (dedup.py): min-label propagation
    over Dataset-resident labels/edges, two coarse exchanges per
    iteration, singletons merged once at the end."""
    from anansi_ray.functions.dedup import connected_components_distributed

    docs = _read(sf_dir, "documents", ["doc_id"])

    def gen_edges(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (i % 7 != 3) & (i % 7 != 6)
        src = i[keep]
        return pa.table(
            {
                "a": pa.array(src, pa.int64()),
                "b": pa.array(src + 1, pa.int64()),
            }
        )

    n_docs = docs.count()

    def drop_tail(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b["b"], pa.scalar(n_docs, pa.int64())))

    edges = docs.map_batches(gen_edges, batch_format="pyarrow").map_batches(
        drop_tail, batch_format="pyarrow"
    )
    out = connected_components_distributed(edges, docs, id_col="doc_id")
    df = out.to_pandas().sort_values("doc_id")
    df["dup_group"] = df["dup_group"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


SQL_LINK_COMPONENTS = """
SELECT doc_id,
       (doc_id - doc_id % 7
        + CASE WHEN doc_id % 7 >= 4 THEN 4 ELSE 0 END)::BIGINT AS dup_group
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def q_events_latest(sf_dir: str):
    """Last-writer-wins compaction: the single latest event row per user by
    (ts DESC, event_id DESC) — the CDC/upsert "keep newest version per key"
    primitive (high-cardinality key, whole-row survivor).

    Scale shape: a per-batch vectorized keep-latest combiner first (one
    lexsort + run-boundary mask, so at most one row per (batch, user) ever
    leaves a block), then ONE hash-partition exchange on ``user_id % P``
    and the identical kernel per partition — no global sort, no driver
    merge; payload columns travel only for surviving rows."""
    P = 64

    def _keep_latest(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-eid, -ts, u))
        su = u[order]
        first = np.r_[True, su[1:] != su[:-1]]
        keep = np.sort(order[first])
        return b.take(pa.array(keep, pa.int64()))

    def partial(b: pa.Table) -> pa.Table:
        out = _keep_latest(b)
        part = pa.array(
            (out["user_id"].to_numpy(zero_copy_only=False) % P).astype(np.int32),
            pa.int32(),
        )
        return out.append_column("part", part)

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return g
        return _keep_latest(g).drop_columns(["part"])

    out = (
        _read(
            sf_dir,
            "events",
            ["event_id", "ts", "user_id", "event_type", "value"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .to_pandas()
    )
    out = _stable(
        out,
        {
            "user_id": "int64",
            "event_id": "int64",
            "ts": "datetime64[us]",
            "event_type": "object",
            "value": "float64",
        },
    ).sort_values("user_id")
    return pa.Table.from_pandas(
        out[["user_id", "event_id", "ts", "event_type", "value"]],
        preserve_index=False,
    )


SQL_EVENTS_LATEST = """
SELECT user_id, event_id, ts, event_type, value
FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id
"""


#: declared pivot vocabulary — SQL PIVOT requires its IN-list up front and
#: the DuckDB twins hardcode these five columns, so the Ray pivot pins the
#: same contract: absent types yield zero-filled columns (an input slice
#: carrying only 3 of the 5 types must still produce the 5-type-wide
#: schema), and any type OUTSIDE the list is ignored, exactly like
#: ``PIVOT ... IN (...)``.
PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _pivot_wide(sf_dir: str, types=PIVOT_EVENT_TYPES):
    """Shared distributed pivot plan (see q_events_pivot): returns the
    aggregated wide Dataset (one row per user) plus the type list —
    q_events_unpivot chains its melt on this without re-deriving.  Pass
    ``types=None`` to DISCOVER the vocabulary with a tiny distinct pass
    (per-batch unique combiner, ≤ |types| rows per block reach the
    driver) instead of declaring it."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def type_partial(b: pa.Table) -> pa.Table:
        u = np.unique(b["event_type"].to_numpy(zero_copy_only=False))
        return pa.table({"event_type": pa.array(u, pa.string())})

    if types is None:
        types = set(
            ds.map_batches(type_partial, batch_format="pyarrow")
            .to_pandas()["event_type"]
            .tolist()
        )
    types = sorted(types)

    def wide_partial(b: pa.Table) -> pa.Table:
        users = b["user_id"].to_numpy(zero_copy_only=False)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        val = b["value"].to_numpy(zero_copy_only=False)
        uu, inv = np.unique(users, return_inverse=True)
        cols: dict = {"user_id": pa.array(uu, pa.int64())}
        for t in types:
            m = et == t
            cols[f"n_{t}"] = pa.array(
                np.bincount(inv[m], minlength=len(uu)).astype(np.int64),
                pa.int64(),
            )
            cols[f"val_{t}"] = pa.array(
                np.bincount(inv[m], weights=val[m], minlength=len(uu)),
                pa.float64(),
            )
        return pa.table(cols)

    from anansi_ray.arrowds import coarse_agg

    aggs = {}
    for t in types:
        aggs[f"n_{t}"] = ("sum", f"n_{t}")
        aggs[f"val_{t}"] = ("sum", f"val_{t}")
    return (
        coarse_agg(
            ds.map_batches(wide_partial, batch_format="pyarrow"),
            "user_id",
            aggs,
        ),
        types,
    )


def q_events_pivot(sf_dir: str):
    """Pivot (wide aggregation): one row per user, one (count, value-sum)
    column pair per event type — the long→wide reshape every feature/metric
    table needs.

    Scale shape: the type vocabulary is declared up front (SQL PIVOT
    IN-list contract; pass ``types=None`` to _pivot_wide to discover it
    with a tiny distinct pass instead), then ONE user-keyed groupby whose
    input is a per-batch wide combiner (np factorize + bincount per
    type), so the exchange carries ≤ |users per batch| wide rows — never
    the event stream."""
    wide, types = _pivot_wide(sf_dir)
    wide_schema = {"user_id": "int64"}
    for t in types:
        wide_schema[f"n_{t}"] = "int64"
        wide_schema[f"val_{t}"] = "float64"
    out = _stable(wide.to_pandas(), wide_schema).sort_values("user_id")
    for t in types:
        out[f"val_{t}"] = out[f"val_{t}"].round(2)
        out[f"n_{t}"] = out[f"n_{t}"].astype("int64")
    return pa.Table.from_pandas(
        out[["user_id"] + [c for t in types for c in (f"n_{t}", f"val_{t}")]],
        preserve_index=False,
    )


SQL_EVENTS_PIVOT = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')   AS n_click,
       round(coalesce(sum(value) FILTER (event_type = 'click'),    0), 2) AS val_click,
       count(*) FILTER (event_type = 'error')   AS n_error,
       round(coalesce(sum(value) FILTER (event_type = 'error'),    0), 2) AS val_error,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       round(coalesce(sum(value) FILTER (event_type = 'purchase'), 0), 2) AS val_purchase,
       count(*) FILTER (event_type = 'signup')  AS n_signup,
       round(coalesce(sum(value) FILTER (event_type = 'signup'),   0), 2) AS val_signup,
       count(*) FILTER (event_type = 'view')    AS n_view,
       round(coalesce(sum(value) FILTER (event_type = 'view'),     0), 2) AS val_view
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_events_unpivot(sf_dir: str):
    """UNPIVOT (wide→long melt) chained on the distributed pivot: the wide
    per-user feature table melts to (user_id, metric, v) INSIDE
    ``map_batches`` — reshape is block-local (np repeat/tile), zero
    additional exchange beyond the pivot's own groupby.  Counts widen to
    float64 (exactly representable) so one value column serves both
    metric families, mirroring UNPIVOT's type unification."""
    wide, types = _pivot_wide(sf_dir)
    metrics = [c for t in types for c in (f"n_{t}", f"val_{t}")]

    def melt(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = []
        for m in metrics:
            v = b[m].to_numpy(zero_copy_only=False).astype(np.float64)
            cols.append(np.round(v, 2) if m.startswith("val_") else v)
        V = np.stack(cols, axis=1)  # rows × metrics
        return pa.table(
            {
                "user_id": pa.array(np.repeat(u, len(metrics)), pa.int64()),
                "metric": pa.array(np.tile(np.array(metrics), len(u)), pa.string()),
                "v": pa.array(V.ravel(), pa.float64()),
            }
        )

    out = _stable(
        wide.map_batches(melt, batch_format="pyarrow").to_pandas(),
        {"user_id": "int64", "metric": "object", "v": "float64"},
    ).sort_values(["user_id", "metric"])
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_EVENTS_UNPIVOT = """
WITH p AS (
  SELECT user_id,
         (count(*) FILTER (event_type = 'click'))::DOUBLE   AS n_click,
         round(coalesce(sum(value) FILTER (event_type = 'click'),    0), 2) AS val_click,
         (count(*) FILTER (event_type = 'error'))::DOUBLE   AS n_error,
         round(coalesce(sum(value) FILTER (event_type = 'error'),    0), 2) AS val_error,
         (count(*) FILTER (event_type = 'purchase'))::DOUBLE AS n_purchase,
         round(coalesce(sum(value) FILTER (event_type = 'purchase'), 0), 2) AS val_purchase,
         (count(*) FILTER (event_type = 'signup'))::DOUBLE  AS n_signup,
         round(coalesce(sum(value) FILTER (event_type = 'signup'),   0), 2) AS val_signup,
         (count(*) FILTER (event_type = 'view'))::DOUBLE    AS n_view,
         round(coalesce(sum(value) FILTER (event_type = 'view'),     0), 2) AS val_view
  FROM events GROUP BY user_id)
SELECT user_id, metric, v
FROM (UNPIVOT p ON n_click, val_click, n_error, val_error, n_purchase,
      val_purchase, n_signup, val_signup, n_view, val_view
      INTO NAME metric VALUE v)
ORDER BY user_id, metric
"""


def q_daily_activity(sf_dir: str):
    """FULL OUTER join of per-day order counts and per-day event counts:
    each side reduces to (day, n) partials inside ``map_batches``
    (combiner), both streams union and ONE day-keyed groupby sums each
    side's column — days present on either side survive with 0 on the
    other, which an inner join would drop.  For aggregated full outer this
    union+groupby plan IS the scale-optimal join: one exchange of
    catalog-sized partials, no null-extension kernel needed."""
    from ray.data.aggregate import Sum

    DAY_US = 86_400_000_000

    def day_partial(col: str, out_col: str, other: str):
        def _p(b: pa.Table) -> pa.Table:
            ts = (
                b[col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
            d = ts // DAY_US
            uniq, inv = np.unique(d, return_inverse=True)
            n = np.bincount(inv).astype(np.int64)
            return pa.table(
                {
                    "day": pa.array(uniq, pa.int64()),
                    out_col: pa.array(n, pa.int64()),
                    other: pa.array(np.zeros(len(uniq), np.int64), pa.int64()),
                }
            ).select(["day", "n_orders", "n_events"])

        return _p

    orders = _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
        day_partial("o_orderdate", "n_orders", "n_events"), batch_format="pyarrow"
    )
    events = _read(sf_dir, "events", ["ts"]).map_batches(
        day_partial("ts", "n_events", "n_orders"), batch_format="pyarrow"
    )
    out = (
        orders.union(events)
        .groupby("day")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("n_events", alias_name="n_events"),
        )
        .to_pandas()
    )
    out = (
        _stable(out, {"day": "int64", "n_orders": "int64", "n_events": "int64"})
        .sort_values("day")
        .astype({"day": "int64", "n_orders": "int64", "n_events": "int64"})
    )
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_DAILY_ACTIVITY = """
WITH o AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  count(*)::BIGINT AS n_orders
           FROM orders GROUP BY 1),
e AS (SELECT epoch_us(ts) // 86400000000 AS day,
             count(*)::BIGINT AS n_events
      FROM events GROUP BY 1)
SELECT coalesce(o.day, e.day)::BIGINT AS day,
       coalesce(n_orders, 0)::BIGINT AS n_orders,
       coalesce(n_events, 0)::BIGINT AS n_events
FROM o FULL OUTER JOIN e ON o.day = e.day
ORDER BY 1
"""


def q_events_user_rank(sf_dir: str):
    """rank() / dense_rank() with REAL ties (integer activity counts) over
    (PARTITION BY event_type ORDER BY n DESC): stage 1 is a pair-level
    count aggregate with a per-batch combiner (the exchange carries one
    (event_type, user_id) row per batch, not one per event).

    Because tied counts share a rank, each user's rank is a pure function
    of (event_type, n) — so stage 2 never partitions by event_type (which
    would cap parallelism at |types| and be unsaltable): a per-batch
    (type, n, c) tie-histogram combiner reduces to a catalog×distinct-n
    table, the driver prefix-sums it into a (type, n) → (rnk, drnk) map
    (rnk = 1 + #users with strictly greater n), and a broadcast
    ``pc.index_in`` probe joins it back block-locally.  Both exchanges
    carry combiner-sized partials; the per-user table itself never
    re-shuffles."""
    import ray
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # integer composite key: factorize the (catalog-sized) type column
        # per batch, then user*|types|+type_idx — exact, no string concat
        types, tinv = np.unique(et, return_inverse=True)
        key, inv = np.unique(u * len(types) + tinv, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        first = np.full(len(key), np.iinfo(np.int64).max)
        np.minimum.at(first, inv, np.arange(len(inv)))
        return pa.table(
            {
                "event_type": pa.array(et[first], pa.string()),
                "user_id": pa.array(u[first], pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    from anansi_ray.arrowds import coarse_agg

    counts = coarse_agg(
        _read(sf_dir, "events", ["event_type", "user_id"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["event_type", "user_id"],
        {"n": ("sum", "n")},
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        types, tinv = np.unique(et, return_inverse=True)
        key, inv = np.unique(tinv * (n.max() + 1 if len(n) else 1) + n, return_inverse=True)
        c = np.bincount(inv).astype(np.int64)
        first = np.full(len(key), np.iinfo(np.int64).max)
        np.minimum.at(first, inv, np.arange(len(inv)))
        return pa.table(
            {
                "event_type": pa.array(et[first], pa.string()),
                "n": pa.array(n[first], pa.int64()),
                "c": pa.array(c, pa.int64()),
            }
        )

    from anansi_ray.arrowds import coarse_agg

    hist = coarse_agg(
        counts.map_batches(hist_partial, batch_format="pyarrow"),
        ["event_type", "n"],
        {"c": ("sum", "c")},
    ).to_pandas()
    hist = _stable(
        hist, {"event_type": "object", "n": "int64", "c": "int64"}
    ).sort_values(["event_type", "n"], ascending=[True, False])
    if len(hist) == 0:
        # no events at all: the window over an empty partition set is empty
        import pandas as pd

        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype="object"),
                    "user_id": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "rnk": pd.Series([], dtype="int64"),
                    "drnk": pd.Series([], dtype="int64"),
                }
            ),
            preserve_index=False,
        )
    # driver-side prefix sums over the tiny tie histogram
    types = hist["event_type"].to_numpy()
    nn = hist["n"].to_numpy().astype(np.int64)
    cc = hist["c"].to_numpy().astype(np.int64)
    new_type = np.r_[True, types[1:] != types[:-1]]
    starts = np.flatnonzero(new_type)
    type_run = np.cumsum(new_type) - 1
    excl = np.cumsum(np.r_[0, cc[:-1]])  # global exclusive prefix of counts
    rnk_map = excl - excl[starts[type_run]] + 1
    drnk_map = np.arange(len(nn), dtype=np.int64) - starts[type_run] + 1
    type_list = sorted(set(types.tolist()))
    t_idx = {t: i for i, t in enumerate(type_list)}
    BIG = int(nn.max()) + 1 if len(nn) else 1
    keys = np.array([t_idx[t] for t in types], np.int64) * BIG + nn
    lookup_ref = ray.put(
        {
            "keys": pa.array(keys, pa.int64()),
            "rnk": rnk_map.astype(np.int64),
            "drnk": drnk_map,
            "types": pa.array(type_list, pa.string()),
            "big": BIG,
        }
    )

    def probe(b: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        ti = pc.index_in(b["event_type"], lk["types"]).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = pc.index_in(
            pa.array(ti * lk["big"] + n, pa.int64()), lk["keys"]
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": b["event_type"],
                "user_id": b["user_id"],
                "n": b["n"],
                "rnk": pa.array(lk["rnk"][pos], pa.int64()),
                "drnk": pa.array(lk["drnk"][pos], pa.int64()),
            }
        )

    out = (
        counts.map_batches(probe, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["event_type", "user_id"])
    )
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_EVENTS_USER_RANK = """
WITH c AS (
  SELECT event_type, user_id, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2)
SELECT event_type, user_id, n,
       rank()       OVER (PARTITION BY event_type ORDER BY n DESC)::BIGINT AS rnk,
       dense_rank() OVER (PARTITION BY event_type ORDER BY n DESC)::BIGINT AS drnk
FROM c ORDER BY event_type, user_id
"""


def q_events_mode(sf_dir: str):
    """Per-key mode (most frequent event_type per user, ties broken by the
    lexicographically smallest type): per-batch (user, type) count
    combiner, ONE exchange on user-hash, then a sorted run-reduce kernel —
    counts merge by run, each user keeps the first row of its max-count
    runs.  No per-user micro-groups; the exchange carries pair partials,
    never raw events."""
    from anansi_ray.arrowds import drop_empty_blocks
    from anansi_ray.functions.dedup import _np, _part_np

    n_parts = 64

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        types, tinv = np.unique(et, return_inverse=True)
        key, inv = np.unique(u * len(types) + tinv, return_inverse=True)
        first = np.full(len(key), np.iinfo(np.int64).max)
        np.minimum.at(first, inv, np.arange(len(inv)))
        n = np.bincount(inv).astype(np.int64)
        uu = u[first]
        return pa.table(
            {
                "part": _part_np(uu, n_parts),
                "user_id": pa.array(uu, pa.int64()),
                "event_type": pa.array(et[first], pa.string()),
                "n": pa.array(n, pa.int64()),
            }
        )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "top_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        t = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("user_id", "ascending"), ("event_type", "ascending")],
            )
        )
        u = _np(t["user_id"])
        et = t["event_type"].to_numpy(zero_copy_only=False)
        n = _np(t["n"])
        # merge partial counts: runs of identical (user, type)
        new_pair = np.r_[True, (u[1:] != u[:-1]) | (et[1:] != et[:-1])]
        pair_id = np.cumsum(new_pair) - 1
        tot = np.zeros(pair_id[-1] + 1, np.int64)
        np.add.at(tot, pair_id, n)
        firsts = np.flatnonzero(new_pair)
        pu, pt = u[firsts], et[firsts]
        # per user: max count, first (lexicographically smallest) type at max
        new_user = np.r_[True, pu[1:] != pu[:-1]]
        user_id_run = np.cumsum(new_user) - 1
        mx = np.full(user_id_run[-1] + 1, np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, user_id_run, tot)
        is_max = tot == mx[user_id_run]
        pick = np.full(user_id_run[-1] + 1, np.iinfo(np.int64).max)
        np.minimum.at(pick, user_id_run[is_max], np.flatnonzero(is_max))
        return pa.table(
            {
                "user_id": pa.array(pu[pick], pa.int64()),
                "top_type": pa.array(pt[pick], pa.string()),
                "n": pa.array(tot[pick], pa.int64()),
            }
        )

    out = _stable(
        drop_empty_blocks(
            _read(sf_dir, "events", ["user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(kernel, batch_format="pyarrow")
            .materialize()
        ).to_pandas(),
        {"user_id": "int64", "top_type": "object", "n": "int64"},
    ).sort_values("user_id")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_EVENTS_MODE = """
WITH c AS (
  SELECT user_id, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
r AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type ASC) AS rn
  FROM c)
SELECT user_id, event_type AS top_type, n FROM r WHERE rn = 1
ORDER BY user_id
"""


def q_users_retention(sf_dir: str):
    """Set intersection (INTERSECT) as a distributed operator: users active
    in BOTH halves of the corpus time range.  Pass 1 is a metadata-sized
    min/max aggregate on the pruned ts column; pass 2 dedups (user, half)
    flags per batch (combiner) and one groupby-user exchange keeps users
    whose half flags span {0,1}.  The exchange carries ≤2 rows per user
    per batch regardless of event volume.  Midpoint uses 2·ts ≤ min+max
    (pure integer, no division) so the SQL twin is exact."""
    from ray.data.aggregate import Max, Min

    mm = (
        _read(sf_dir, "events", ["ts"])
        .map_batches(
            lambda b: pa.table({"ts": ts_us(b["ts"].combine_chunks())}),
            batch_format="pyarrow",
        )
        .aggregate(Min("ts"), Max("ts"))
    )
    lo, hi = mm["min(ts)"], mm["max(ts)"]
    # empty events: min/max are None and no user can appear in either half
    pivot = (lo + hi) if lo is not None and hi is not None else 0

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = ts_us(b["ts"].combine_chunks()).to_numpy(zero_copy_only=False)
        half = (2 * ts > pivot).astype(np.int64)
        key = u * 2 + half
        uniq = np.unique(key)
        return pa.table(
            {
                "user_id": pa.array(uniq >> 1, pa.int64()),
                "h": pa.array(uniq & 1, pa.int64()),
            }
        )

    from anansi_ray.arrowds import coarse_agg

    g = coarse_agg(
        _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        "user_id",
        {"h0": ("min", "h"), "h1": ("max", "h")},
    )
    t = _stable(
        g.map_batches(
            lambda b: b.filter(
                pc.and_(pc.equal(b["h0"], 0), pc.equal(b["h1"], 1))
            ).select(["user_id"]),
            batch_format="pyarrow",
        ).to_pandas(),
        {"user_id": "int64"},
    )
    return pa.Table.from_pandas(
        t.sort_values("user_id").astype({"user_id": "int64"}), preserve_index=False
    )


SQL_USERS_RETENTION = """
WITH b AS (SELECT min(epoch_us(ts)) + max(epoch_us(ts)) AS mm FROM events)
SELECT user_id FROM events, b WHERE 2 * epoch_us(ts) <= mm
INTERSECT
SELECT user_id FROM events, b WHERE 2 * epoch_us(ts) > mm
ORDER BY user_id
"""


def q_lineitem_cube(sf_dir: str):
    """CUBE grouping sets (all four subsets of {returnflag, linestatus}):
    like the ROLLUP above, ONE distributed groupby at the finest grain;
    the other three grouping sets are derived on the driver from that
    |flags|×|statuses|-row table — zero extra exchanges vs a
    shuffle-per-grouping-set plan."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    finest = (
        _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    finest = _stable(
        finest,
        {
            "l_returnflag": "object",
            "l_linestatus": "object",
            "sum_qty": "float64",
            "count_order": "int64",
        },
    )
    by_flag = finest.groupby("l_returnflag", as_index=False).agg(
        sum_qty=("sum_qty", "sum"), count_order=("count_order", "sum")
    )
    by_flag["l_linestatus"] = "ALL"
    by_status = finest.groupby("l_linestatus", as_index=False).agg(
        sum_qty=("sum_qty", "sum"), count_order=("count_order", "sum")
    )
    by_status["l_returnflag"] = "ALL"
    total = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            # SQL SUM over an empty grand-total grouping set is NULL
            "sum_qty": [finest["sum_qty"].sum() if len(finest) else None],
            "count_order": [finest["count_order"].sum()],
        }
    )
    out = pd.concat([finest, by_flag, by_status, total], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "sum_qty", "count_order"]
    ]
    out["sum_qty"] = out["sum_qty"].round(2)
    out["count_order"] = out["count_order"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values(["l_returnflag", "l_linestatus"]), preserve_index=False
    )


SQL_LINEITEM_CUBE = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*)::BIGINT AS count_order
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY 1, 2
"""


def q_event_type_pairs(sf_dir: str):
    """Co-occurrence / market-basket pairs: for every unordered pair of
    event types, how many users produced both.  Per-batch (user, type)
    dedup combiner → one user-hash exchange → each partition kernel
    compresses every user's type set to a BITMASK with one C-level
    ``np.bitwise_or.reduceat`` (|types| is catalog-sized, ≤63), histograms
    the distinct masks, and expands pairs per DISTINCT MASK (≤2^|types|
    iterations, independent of user count); a final tiny groupby sums
    partial pair counts.  This is the self-join `d a JOIN d b ON
    a.user=b.user AND a.type<b.type` with neither the join nor a per-user
    loop materialized."""
    from ray.data.aggregate import Sum

    from anansi_ray.arrowds import drop_empty_blocks
    from anansi_ray.functions.dedup import _np, _part_np

    n_parts = 64

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        types, tinv = np.unique(et, return_inverse=True)
        _, idx = np.unique(u * len(types) + tinv, return_index=True)
        uu = u[idx]
        return pa.table(
            {
                "part": _part_np(uu, n_parts),
                "user_id": pa.array(uu, pa.int64()),
                "event_type": pa.array(et[idx], pa.string()),
            }
        )

    def kernel(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "type_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "n_users": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        t = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("user_id", "ascending"), ("event_type", "ascending")],
            )
        )
        u = _np(t["user_id"])
        et = t["event_type"].to_numpy(zero_copy_only=False).astype("U")
        # drop duplicate (user, type) rows surviving from different batches
        keep = np.r_[True, (u[1:] != u[:-1]) | (et[1:] != et[:-1])]
        u, et = u[keep], et[keep]
        types, tinv = np.unique(et, return_inverse=True)
        if len(types) > 63:
            raise ValueError(
                "event_type_pairs assumes a catalog-sized type set (<=63); "
                f"partition saw {len(types)}"
            )
        # per-user type BITMASK via one C-level reduceat — no Python loop
        # over users; the only loop left is over DISTINCT masks (<=2^|types|)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        bits = np.left_shift(np.int64(1), tinv.astype(np.int64))
        masks = np.bitwise_or.reduceat(bits, starts)
        um, cnt = np.unique(masks, return_counts=True)
        pair_n: dict[tuple[int, int], int] = {}
        for mask, c in zip(um.tolist(), cnt.tolist()):
            on = [i for i in range(len(types)) if mask >> i & 1]
            for x in range(len(on)):
                for y in range(x + 1, len(on)):
                    k = (on[x], on[y])
                    pair_n[k] = pair_n.get(k, 0) + int(c)
        if not pair_n:
            return empty
        ks = sorted(pair_n)
        return pa.table(
            {
                "type_a": pa.array([types[a] for a, _ in ks], pa.string()),
                "type_b": pa.array([types[b] for _, b in ks], pa.string()),
                "n_users": pa.array([pair_n[k] for k in ks], pa.int64()),
            }
        )

    out = (
        drop_empty_blocks(
            _read(sf_dir, "events", ["user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(kernel, batch_format="pyarrow")
            .materialize()
        )
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
    )
    out = (
        _stable(
            out, {"type_a": "object", "type_b": "object", "n_users": "int64"}
        )
        .sort_values(["type_a", "type_b"])
        .astype({"n_users": "int64"})
    )
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_EVENT_TYPE_PAIRS = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*)::BIGINT AS n_users
FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Round-4 additions: RAG chunking, inverted index, cohort retention,
# set difference, Z-order layout, banded fuzzy matching.
# ---------------------------------------------------------------------------


def q_doc_chunks(sf_dir: str):
    """RAG document chunking: fixed 200-char windows with 50-char overlap
    (stride 150), last chunk truncated at the doc end.  Emits (doc_id,
    chunk_idx, start_pos, chunk_len, code_sum) where ``code_sum`` is the
    sum of the chunk's Unicode code points — a content checksum that makes
    the operator value-comparable without shipping chunk text.

    Scale shape: block-local ``map_batches`` (ZERO shuffle); each batch is
    decoded once to a UTF-32 code array and every chunk checksum is a
    cumsum difference (functions/text.py chunk_documents_batch).  Output is
    ~100x smaller than the corpus; downstream embedders re-slice text
    locally from the offsets."""
    out = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(ftext.chunk_documents_batch, batch_format="pyarrow")
        .to_pandas()
    )
    out = _stable(
        out,
        {
            "doc_id": "int64",
            "chunk_idx": "int64",
            "start_pos": "int64",
            "chunk_len": "int64",
            "code_sum": "int64",
        },
    )
    return pa.Table.from_pandas(
        out.sort_values(["doc_id", "chunk_idx"]), preserve_index=False
    )


SQL_DOC_CHUNKS = r"""
WITH d AS (SELECT doc_id, coalesce(text, '') AS text,
                  length(coalesce(text, ''))::BIGINT AS n FROM documents),
c AS (SELECT doc_id, text, n,
             unnest(generate_series(0,
               CASE WHEN n <= 200 THEN 0
                    ELSE CAST(ceil((n - 200) / 150.0) AS BIGINT) END)) AS i
      FROM d),
k AS (SELECT doc_id, i, substr(text, CAST(i * 150 + 1 AS INT), 200) AS chunk
      FROM c),
x AS (SELECT doc_id, i, chunk,
             unnest(generate_series(1, greatest(length(chunk), 1))) AS j
      FROM k)
SELECT doc_id, i::BIGINT AS chunk_idx, (i * 150 + 1)::BIGINT AS start_pos,
       length(chunk)::BIGINT AS chunk_len,
       coalesce(sum(ascii(substr(chunk, CAST(j AS INT), 1))), 0)::BIGINT AS code_sum
FROM x GROUP BY doc_id, i, chunk ORDER BY doc_id, chunk_idx
"""


def q_inverted_index(sf_dir: str):
    """Inverted-index construction (search / dedup primitive): for every
    token with document frequency >= 2, the ascending comma-joined posting
    list of doc_ids.

    Scale shape: per-batch distinct (token, doc) pair combiner
    (functions/text.py token_doc_pairs — pairs are globally distinct
    because a doc lives in exactly one batch), md5-based token partition
    tag computed once per DISTINCT batch token (vocabulary-sized, never the
    token stream), ONE token-hash exchange, then a per-partition kernel
    that builds every posting string in one vectorized ``pc.binary_join``
    over run boundaries (the customer_order_list kernel applied to
    postings).  Posting strings never touch the driver."""
    import hashlib

    import pandas as pd

    P = 32

    def tag(b: pa.Table) -> pa.Table:
        toks = b["token"].to_numpy(zero_copy_only=False)
        vocab, inv = np.unique(toks, return_inverse=True)
        vpart = np.fromiter(
            (int.from_bytes(hashlib.md5(v.encode()).digest()[:4], "big") % P
             for v in vocab),
            dtype=np.int32,
            count=len(vocab),
        )
        return b.append_column("part", pa.array(vpart[inv], pa.int32()))

    empty = pa.table(
        {
            "token": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "postings": pa.array([], pa.string()),
        }
    )

    def agg_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        df = pd.DataFrame(
            {
                "token": g["token"].to_numpy(zero_copy_only=False),
                "doc_id": g["doc_id"].to_numpy(zero_copy_only=False),
            }
        ).sort_values(["token", "doc_id"], kind="mergesort")
        t = df["token"].to_numpy()
        d = df["doc_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, t[1:] != t[:-1]])
        counts = np.diff(np.r_[starts, len(t)])
        keep = counts >= 2
        if not keep.any():
            return empty
        offsets = np.r_[starts, len(t)].astype(np.int32)
        strs = pc.cast(pa.array(d, pa.int64()), pa.string())
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), strs)
        joined = pc.binary_join(lists, ",")
        return pa.table(
            {
                "token": pa.array(t[starts][keep], pa.string()),
                "df": pa.array(counts[keep].astype(np.int64), pa.int64()),
                "postings": joined.filter(pa.array(keep)),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    out = (
        drop_empty_blocks(
            _read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(ftext.token_doc_pairs, batch_format="pyarrow")
            .map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(agg_part, batch_format="pyarrow")
            .materialize()
        )
        .to_pandas()
    )
    out = _stable(
        out, {"token": "object", "df": "int64", "postings": "object"}
    ).sort_values("token")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_INVERTED_INDEX = r"""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\w+')) AS token
  FROM documents)
SELECT token, count(*)::BIGINT AS df,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM tok GROUP BY token HAVING count(*) >= 2 ORDER BY token
"""


def q_cohort_retention(sf_dir: str):
    """Cohort retention analysis: assign every user to the cohort of their
    first active day, then count users per (cohort_day, day_offset) —
    the classic retention triangle.

    Scale shape: per-batch distinct (user, day) combiner (the exchange
    carries at most one row per user-day per batch, never the event
    stream), ONE ``user_id % P`` hash exchange, then a partition kernel
    that derives each user's cohort from run boundaries of ONE lexsort and
    emits (cohort, offset) partial counts; the final groupby moves only
    the catalog-sized retention triangle (~days^2 rows)."""
    P = 32
    DAY_US = 86_400_000_000

    def pairs(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (
            ts_us(b["ts"].combine_chunks()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        key = np.unique(u * 1_000_000 + d)
        user = key // 1_000_000
        return pa.table(
            {
                "part": pa.array((user % P).astype(np.int32), pa.int32()),
                "user_id": pa.array(user, pa.int64()),
                "day": pa.array(key % 1_000_000, pa.int64()),
            }
        )

    empty = pa.table(
        {
            "cohort_day": pa.array([], pa.int64()),
            "day_offset": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def part_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        u = g["user_id"].to_numpy(zero_copy_only=False)
        d = g["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        us, ds = u[order], d[order]
        new_user = np.r_[True, us[1:] != us[:-1]]
        first_day = ds[np.flatnonzero(new_user)]
        cohort = first_day[np.cumsum(new_user) - 1]
        # cross-batch duplicate (user, day) pairs are adjacent after the
        # sort: keep first occurrences only
        uniq = np.r_[True, new_user[1:] | (ds[1:] != ds[:-1])]
        key = cohort[uniq] * 1_000_000 + (ds - cohort)[uniq]  # offsets < 1e6
        vals, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "cohort_day": pa.array(vals // 1_000_000, pa.int64()),
                "day_offset": pa.array(vals % 1_000_000, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    from anansi_ray.arrowds import drop_empty_blocks

    out = (
        drop_empty_blocks(
            _read(sf_dir, "events", ["user_id", "ts"])
            .map_batches(pairs, batch_format="pyarrow")
            .groupby("part")
            .map_groups(part_kernel, batch_format="pyarrow")
            .materialize()
        )
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()
    )
    out = (
        _stable(
            out, {"cohort_day": "int64", "day_offset": "int64", "n_users": "int64"}
        )
        .sort_values(["cohort_day", "day_offset"])
        .astype({"n_users": "int64"})
    )
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_COHORT_RETENTION = """
WITH ud AS (SELECT DISTINCT user_id,
                   CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS d
            FROM events),
c AS (SELECT user_id, min(d) AS cohort_day FROM ud GROUP BY 1)
SELECT c.cohort_day, (ud.d - c.cohort_day)::BIGINT AS day_offset,
       count(*)::BIGINT AS n_users
FROM ud JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_users_churn(sf_dir: str):
    """Set difference (EXCEPT) as a distributed operator: purchasing users
    who never placed a "milestone" purchase (integer cents divisible by
    97 — a deterministic ~1 %-of-events predicate that stays meaningful at
    every scale, unlike a time split on this uniformly-active corpus).
    Shape: per-batch (user, flag) dedup combiner — each batch forwards at
    most two rows per user regardless of event volume — then ONE
    groupby-user exchange keeping users whose max flag is 0."""
    from ray.data.aggregate import Max

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        keep = et == "purchase"
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        v = b["value"].to_numpy(zero_copy_only=False)[keep]
        cents = np.round(v * 100).astype(np.int64)
        hit = (cents % 97 == 0).astype(np.int64)
        uniq = np.unique(u * 2 + hit)
        return pa.table(
            {
                "user_id": pa.array(uniq >> 1, pa.int64()),
                "h": pa.array(uniq & 1, pa.int64()),
            }
        )

    from anansi_ray.arrowds import coarse_agg

    g = coarse_agg(
        _read(sf_dir, "events", ["user_id", "event_type", "value"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        "user_id",
        {"h1": ("max", "h")},
    )
    t = g.map_batches(
        lambda b: b.filter(pc.equal(b["h1"], 0)).select(["user_id"]),
        batch_format="pyarrow",
    ).to_pandas()
    if t.empty:  # churn can legitimately be empty; keep the schema
        return pa.table({"user_id": pa.array([], pa.int64())})
    return pa.Table.from_pandas(
        t.sort_values("user_id").astype({"user_id": "int64"}), preserve_index=False
    )


SQL_USERS_CHURN = """
SELECT user_id FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'purchase'
  AND CAST(round(value * 100) AS BIGINT) % 97 = 0
ORDER BY user_id
"""


def _morton16(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave two 8-bit dims into a 16-bit Morton (Z-order) key."""
    m = np.zeros_like(x)
    for i in range(8):
        m |= ((x >> i) & 1) << (2 * i)
        m |= ((y >> i) & 1) << (2 * i + 1)
    return m


def q_zorder_layout(sf_dir: str):
    """Z-order (Morton) layout assignment — the multi-dimensional
    clustering step a 100-TB table needs for two-column row-group pruning:
    each lineitem row gets the Morton interleave of its 8-bit
    (l_partkey % 256, l_suppkey % 256) coordinates; the top 6 Morton bits
    name one of 64 Z-cells (= target files).  Output is the per-cell
    layout manifest (row count + the bounding box of both dims), i.e. the
    min/max pruning index a reader would consult: Z-cells bound RECTANGLES
    in (partkey, suppkey) space, so a conjunctive range predicate prunes
    on both columns at once — the property a single-column sort cannot
    give.

    Scale shape: per-batch Morton keys are pure numpy bit math; a
    64-bucket ``np.minimum.at``/``bincount`` combiner reduces each batch to
    <= 64 manifest rows BEFORE the exchange; the final groupby moves only
    cell partials.  The actual data movement this manifest implies (one
    `repartition` by zcell at write time) reuses the bucketed-store
    two-phase exchange (sources/webstore.py)."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = pk % 256, sk % 256
        cell = (_morton16(x, y) >> 10).astype(np.int64)
        n = np.bincount(cell, minlength=64)
        mnx = np.full(64, np.iinfo(np.int64).max)
        mxx = np.full(64, -1)
        mny = np.full(64, np.iinfo(np.int64).max)
        mxy = np.full(64, -1)
        np.minimum.at(mnx, cell, x)
        np.maximum.at(mxx, cell, x)
        np.minimum.at(mny, cell, y)
        np.maximum.at(mxy, cell, y)
        keep = n > 0
        cells = np.flatnonzero(keep)
        return pa.table(
            {
                "zcell": pa.array(cells, pa.int64()),
                "n": pa.array(n[keep].astype(np.int64), pa.int64()),
                "min_x": pa.array(mnx[keep], pa.int64()),
                "max_x": pa.array(mxx[keep], pa.int64()),
                "min_y": pa.array(mny[keep], pa.int64()),
                "max_y": pa.array(mxy[keep], pa.int64()),
            }
        )

    from anansi_ray.arrowds import coarse_agg

    out = (
        coarse_agg(
            _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
                partial, batch_format="pyarrow"
            ),
            "zcell",
            {
                "n_rows": ("sum", "n"),
                "min_x": ("min", "min_x"),
                "max_x": ("max", "max_x"),
                "min_y": ("min", "min_y"),
                "max_y": ("max", "max_y"),
            },
        )
        .to_pandas()
    )
    out = _stable(
        out,
        {
            "zcell": "int64",
            "n_rows": "int64",
            "min_x": "int64",
            "max_x": "int64",
            "min_y": "int64",
            "max_y": "int64",
        },
    ).sort_values("zcell")
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


#: Morton interleave of 8-bit x/y as a static SQL expression (16 terms)
_SQL_MORTON = " + ".join(
    f"(((x >> {i}) & 1) * {1 << (2 * i)}) + (((y >> {i}) & 1) * {1 << (2 * i + 1)})"
    for i in range(8)
)

SQL_ZORDER_LAYOUT = f"""
WITH xy AS (SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem),
m AS (SELECT x, y, ({_SQL_MORTON}) // 1024 AS zcell FROM xy)
SELECT zcell::BIGINT AS zcell, count(*)::BIGINT AS n_rows,
       min(x)::BIGINT AS min_x, max(x)::BIGINT AS max_x,
       min(y)::BIGINT AS min_y, max(y)::BIGINT AS max_y
FROM m GROUP BY zcell ORDER BY zcell
"""


def q_fuzzy_name_match(sf_dir: str):
    """Banded fuzzy (edit-distance) matching over a vocabulary: pairs of
    DISTINCT part names within Levenshtein distance 2, banded by equal
    length (the standard length-band blocking rule — distance <= 2 with
    unequal lengths is possible, but the BAND is part of the operator's
    definition and the SQL twin applies the identical predicate).

    Scale shape: the corpus is first collapsed to its vocabulary by a
    per-batch distinct combiner + one groupby — driver state is bounded by
    |vocab|, which for entity names is catalog-sized regardless of table
    rows (64 distinct names across 2k..20M parts here).  The DP itself is
    vectorized ACROSS pairs (numpy (n_pairs,) lanes; the i/j loops run
    over name length, ~10 steps), never per-pair Python."""
    vocab = (
        _read(sf_dir, "part", ["p_name"])
        .map_batches(
            lambda b: pa.table(
                {"p_name": pa.array(np.unique(b["p_name"].to_numpy(zero_copy_only=False)))}
            ),
            batch_format="pyarrow",
        )
        .groupby("p_name")
        .count()
        .to_pandas()
        .pipe(_stable, {"p_name": "object"})["p_name"]
        .to_numpy()
    )
    vocab = np.sort(vocab)
    by_len: dict[int, list] = {}
    for v in vocab:  # vocabulary-sized loop (catalog), not the table
        by_len.setdefault(len(v), []).append(v)

    rows_a, rows_b, dists = [], [], []
    for L, names in sorted(by_len.items()):
        if len(names) < 2 or L == 0:
            continue
        mat = np.frombuffer(
            "".join(names).encode("utf-32-le"), dtype=np.uint32
        ).reshape(len(names), L)
        ia, ib = np.triu_indices(len(names), k=1)
        A, B = mat[ia], mat[ib]
        prev = np.tile(np.arange(L + 1, dtype=np.int32), (len(ia), 1))
        for i in range(1, L + 1):
            cur = np.empty_like(prev)
            cur[:, 0] = i
            ai = A[:, i - 1]
            for j in range(1, L + 1):
                cost = (ai != B[:, j - 1]).astype(np.int32)
                cur[:, j] = np.minimum(
                    np.minimum(cur[:, j - 1] + 1, prev[:, j] + 1),
                    prev[:, j - 1] + cost,
                )
            prev = cur
        d = prev[:, -1]
        keep = d <= 2
        for k in np.flatnonzero(keep):
            rows_a.append(names[ia[k]])
            rows_b.append(names[ib[k]])
            dists.append(int(d[k]))

    import pandas as pd

    out = pd.DataFrame(
        {"name_a": rows_a, "name_b": rows_b, "dist": np.array(dists, np.int64)}
    ).sort_values(["name_a", "name_b"])
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_FUZZY_NAME_MATCH = """
WITH v AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name)::BIGINT AS dist
FROM v a JOIN v b
  ON a.p_name < b.p_name AND length(a.p_name) = length(b.p_name)
WHERE levenshtein(a.p_name, b.p_name) <= 2
ORDER BY name_a, name_b
"""


def q_purchase_attribution(sf_dir: str):
    """Last-touch attribution (sessionized marketing analytics): for every
    purchase, the type of the user's most recent PRECEDING non-purchase
    event (NULL when the purchase is the user's first event).

    Scale shape: ONE ``user_id % P`` co-partitioning exchange, then a
    sorted partition kernel — the forward-fill is one masked
    ``np.maximum.accumulate`` over event indices with per-user run resets
    (the as-of join's fill trick applied within one table).  No pair
    materialization, no per-row Python; the SQL twin is the IGNORE-NULLS
    last_value window."""
    P = 32

    def tag(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((u % P).astype(np.int32), pa.int32()),
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": ts_us(b["ts"].combine_chunks()),
                "event_type": b["event_type"],
            }
        )

    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "touch_type": pa.array([], pa.string()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        us, es, ets = u[order], eid[order], et[order]
        idx = np.arange(len(us), dtype=np.int64)
        non_purchase = ets != "purchase"
        ffill = np.maximum.accumulate(np.where(non_purchase, idx, -1))
        new_user = np.r_[True, us[1:] != us[:-1]]
        user_start = idx[new_user][np.cumsum(new_user) - 1]
        valid = ffill >= user_start  # a fill from a previous user is < start
        purch = ~non_purchase
        touch = np.where(valid & purch, ets[np.maximum(ffill, 0)], None)
        return pa.table(
            {
                "event_id": pa.array(es[purch], pa.int64()),
                "touch_type": pa.array(touch[purch], pa.string()),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    out = (
        drop_empty_blocks(
            _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(kernel, batch_format="pyarrow")
            .materialize()
        )
        .to_pandas()
    )
    out = _stable(
        out, {"event_id": "int64", "touch_type": "object"}
    ).sort_values("event_id")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_PURCHASE_ATTRIBUTION = """
SELECT event_id,
       last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                  IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type
FROM events
QUALIFY event_type = 'purchase'
ORDER BY event_id
"""


def q_snapshot_diff(sf_dir: str):
    """CDC snapshot diff (the merge/upsert building block): classify every
    doc_id as added / removed / changed between snapshot A (the documents
    table) and snapshot B (a deterministic evolution of it: doc_id % 11 = 0
    deleted, doc_id % 7 = 0 rewritten with a ' v2' suffix, one insert with
    key doc_id + 10^7 per doc_id % 13 = 0).  B is derived inside the
    operator so the oracle can derive the identical snapshot — the Ray side
    still computes the diff purely from content hashes, never from the
    closed form.

    Scale shape: each side collapses per batch to (doc_id, side_bit,
    content_hash) — 8-byte hashes, not text — then ONE groupby-doc_id
    exchange with algebraic aggregates (count, min/max of side-tagged
    hashes) classifies every key block-locally.  Unchanged keys are
    filtered AFTER the aggregate but the exchange already carries only
    hashes (at 100 TB: text never shuffles; the exchange is ~24 B/key)."""
    import hashlib

    def to_sides(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        texts = b["text"].to_pylist()

        def h64(strs):
            return np.fromiter(
                (
                    int.from_bytes(hashlib.md5((s or "").encode()).digest()[:8], "big")
                    >> 1  # keep it in int64 range
                    for s in strs
                ),
                dtype=np.int64,
                count=len(strs),
            )

        out_id, out_side, out_h = [], [], []
        # side A: every doc as-is
        out_id.append(ids)
        out_side.append(np.zeros(len(ids), np.int64))
        out_h.append(h64(texts))
        # side B: deletes, rewrites, inserts
        keep = ids % 11 != 0
        b_ids = ids[keep]
        b_txt = [
            (t or "") + (" v2" if i % 7 == 0 else "")
            for i, t in zip(b_ids, [texts[j] for j in np.flatnonzero(keep)])
        ]
        out_id.append(b_ids)
        out_side.append(np.ones(len(b_ids), np.int64))
        out_h.append(h64(b_txt))
        ins = ids[ids % 13 == 0]
        out_id.append(ins + 10_000_000)
        out_side.append(np.ones(len(ins), np.int64))
        out_h.append(h64([f"new doc {i}" for i in ins]))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "side": pa.array(np.concatenate(out_side), pa.int64()),
                "h": pa.array(np.concatenate(out_h), pa.int64()),
            }
        )

    from anansi_ray.arrowds import coarse_agg

    g = coarse_agg(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            to_sides, batch_format="pyarrow"
        ),
        "doc_id",
        {
            "n": ("count", "side"),
            "s0": ("min", "side"),
            "s1": ("max", "side"),
            "h0": ("min", "h"),
            "h1": ("max", "h"),
        },
    )

    def classify(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        s0 = b["s0"].to_numpy(zero_copy_only=False)
        s1 = b["s1"].to_numpy(zero_copy_only=False)
        h0 = b["h0"].to_numpy(zero_copy_only=False)
        h1 = b["h1"].to_numpy(zero_copy_only=False)
        added = (n == 1) & (s0 == 1)
        removed = (n == 1) & (s1 == 0)
        changed = (n == 2) & (h0 != h1)
        keep = added | removed | changed
        label = np.where(added, "added", np.where(removed, "removed", "changed"))
        return pa.table(
            {
                "doc_id": b["doc_id"].filter(pa.array(keep)),
                "change": pa.array(label[keep], pa.string()),
            }
        )

    out = _stable(
        g.map_batches(classify, batch_format="pyarrow").to_pandas(),
        {"doc_id": "int64", "change": "object"},
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("doc_id"), preserve_index=False)


SQL_SNAPSHOT_DIFF = """
WITH a AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
b AS (
  SELECT doc_id,
         text || (CASE WHEN doc_id % 7 = 0 THEN ' v2' ELSE '' END) AS text
  FROM a WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + 10000000, 'new doc ' || doc_id FROM a WHERE doc_id % 13 = 0)
SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.text <> b.text
ORDER BY doc_id
"""


def _skyline_kernel(cents: np.ndarray, day: np.ndarray, key: np.ndarray):
    """Vectorized 2-D skyline (minimize both dims): returns the boolean
    keep-mask in the (cents, day, key) sort order plus that order.
    Dominance is <=/<= with strictness in at least one dim; duplicate
    points all survive (none strictly dominates its twin)."""
    order = np.lexsort((key, day, cents))
    x, y = cents[order], day[order]
    new_x = np.r_[True, x[1:] != x[:-1]]
    group_first_y = y[np.flatnonzero(new_x)][np.cumsum(new_x) - 1]
    cummin = np.minimum.accumulate(y)
    group_start = np.flatnonzero(new_x)[np.cumsum(new_x) - 1]
    pm = np.where(group_start > 0, cummin[np.maximum(group_start - 1, 0)], np.iinfo(np.int64).max)
    keep = (pm > y) & (y == group_first_y)
    return keep, order


def q_orders_skyline(sf_dir: str):
    """2-D skyline / Pareto frontier: orders not dominated on (price, date)
    — no other order is both cheaper-or-equal AND earlier-or-equal (strict
    in at least one).  The multi-objective "best offers" operator.

    Scale shape: the skyline is COMPOSABLE — every globally non-dominated
    point is non-dominated in any subset containing it, so pass 1 runs the
    vectorized skyline kernel per batch (a combiner that typically shrinks
    n rows to O(log^2 n) candidates on non-adversarial data), and pass 2
    re-runs the identical kernel once over the union of survivors.  The
    corpus never shuffles; only candidates move.  Worst case
    (anti-correlated dims) the skyline is O(n) and pass 2 concentrates —
    documented trade; a range-partitioned cascade (the prefix-scan shape)
    is the escape hatch."""
    DAY_US = 86_400_000_000

    def local_skyline(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                    "day": pa.array([], pa.int64()),
                }
            )
        if "cents" in b.column_names:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            cents = b["cents"].to_numpy(zero_copy_only=False)
            day = b["day"].to_numpy(zero_copy_only=False)
        else:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            cents = np.round(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            day = (
                ts_us(b["o_orderdate"].combine_chunks()).to_numpy(
                    zero_copy_only=False
                )
                // DAY_US
            )
        keep, order = _skyline_kernel(cents, day, k)
        return pa.table(
            {
                "o_orderkey": pa.array(k[order][keep], pa.int64()),
                "cents": pa.array(cents[order][keep], pa.int64()),
                "day": pa.array(day[order][keep], pa.int64()),
            }
        )

    out = _stable(
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])
        .map_batches(local_skyline, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local_skyline, batch_format="pyarrow")
        .to_pandas(),
        {"o_orderkey": "int64", "cents": "int64", "day": "int64"},
    ).sort_values("o_orderkey")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_ORDERS_SKYLINE = """
WITH p AS (SELECT o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  CAST(floor(epoch_us(o_orderdate) / 86400000000) AS BIGINT) AS day
           FROM orders),
w AS (SELECT o_orderkey, cents, day,
             min(day) OVER (ORDER BY cents
                            RANGE BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS pm,
             min(day) OVER (PARTITION BY cents) AS xm
      FROM p)
SELECT o_orderkey, cents, day FROM w
WHERE (pm IS NULL OR pm > day) AND xm = day
ORDER BY o_orderkey
"""


def q_events_regression(sf_dir: str):
    """Per-group exact least-squares regression (value-cents against
    minutes since the corpus start, per event type) — the algebraic-
    aggregate family: each batch contributes integer partials (n, Σx, Σy,
    Σxy, Σx² with Σx² carried as two int64 limbs at base 1e9, the
    lineitem_variance overflow trick) and the closed form runs on the
    |types|-row driver result with exact Python big-ints.  Slope/intercept
    are emitted as integer-scaled TRUNCATING divisions (slope·1e9,
    intercept·1e6) so the SQL twin — HUGEINT sums, `//` — is bit-exact.

    Shape: metadata-sized global-min pass + ONE combiner-fed groupby; the
    exchange carries |types| rows per batch."""
    from ray.data.aggregate import Min, Sum

    mn = (
        _read(sf_dir, "events", ["ts"])
        .map_batches(
            lambda b: pa.table({"ts": ts_us(b["ts"].combine_chunks())}),
            batch_format="pyarrow",
        )
        .aggregate(Min("ts"))
    )["min(ts)"]
    # empty events: Min over nothing is None; any origin works since the
    # grouped pass below produces zero rows either way
    MIN_US = int(mn) if mn is not None else 0

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        et = b["event_type"].to_numpy(zero_copy_only=False)
        ts = ts_us(b["ts"].combine_chunks()).to_numpy(zero_copy_only=False)
        x = (ts - MIN_US) // 60_000_000  # minutes since corpus start
        y = np.round(b["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        xx = x * x
        df = pd.DataFrame(
            {
                "event_type": et,
                "n": np.ones(len(x), np.int64),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx_hi": xx // 1_000_000_000,
                "sxx_lo": xx % 1_000_000_000,
            }
        )
        g = df.groupby("event_type", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    g = (
        _read(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx_hi", alias_name="sxx_hi"),
            Sum("sxx_lo", alias_name="sxx_lo"),
        )
        .to_pandas()
    )
    g = _stable(
        g,
        {
            "event_type": "object",
            "n": "int64",
            "sx": "int64",
            "sy": "int64",
            "sxy": "int64",
            "sxx_hi": "int64",
            "sxx_lo": "int64",
        },
    ).sort_values("event_type")

    def tdiv(a: int, b: int) -> int:  # truncating division (SQL `//`)
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    rows = []
    for r in g.itertuples():  # |event types| rows — catalog-sized
        n, sx, sy, sxy = int(r.n), int(r.sx), int(r.sy), int(r.sxy)
        sxx = int(r.sxx_hi) * 1_000_000_000 + int(r.sxx_lo)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope_e9 = tdiv(10**9 * num, den)
        intercept_e6 = tdiv(10**6 * (sy * den - num * sx), den * n)
        rows.append((r.event_type, n, slope_e9, intercept_e6))
    if not rows:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "slope_e9": pa.array([], pa.int64()),
                "intercept_e6": pa.array([], pa.int64()),
            }
        )
    et, n, s, i = zip(*rows)
    return pa.table(
        {
            "event_type": pa.array(et, pa.string()),
            "n": pa.array(n, pa.int64()),
            "slope_e9": pa.array(s, pa.int64()),
            "intercept_e6": pa.array(i, pa.int64()),
        }
    )


SQL_EVENTS_REGRESSION = """
WITH b AS (SELECT min(epoch_us(ts)) AS mn FROM events),
p AS (SELECT event_type,
             (epoch_us(ts) - mn) // 60000000 AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events, b),
s AS (SELECT event_type, count(*)::HUGEINT AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM p GROUP BY 1)
SELECT event_type, n::BIGINT AS n,
       ((1000000000::HUGEINT * (n * sxy - sx * sy))
        // (n * sxx - sx * sx))::BIGINT AS slope_e9,
       ((1000000::HUGEINT * (sy * (n * sxx - sx * sx)
                             - (n * sxy - sx * sy) * sx))
        // ((n * sxx - sx * sx) * n))::BIGINT AS intercept_e6
FROM s ORDER BY event_type
"""


def q_spearman_len_tokens(sf_dir: str):
    """Exact Spearman rank correlation between document token count and
    character count — the tie-aware rank statistic, computed without any
    global sort: both variables have BOUNDED value domains, so their
    average-rank maps come from tiny value histograms (per-batch
    value-count combiner → driver merge), are broadcast back, and one
    streaming pass accumulates INTEGER sums of doubled ranks (avg rank
    over ties is a half-integer ⇒ 2·rank is exact int64).  Only the
    final ρ division/sqrt is float, rounded to 6.  Full SQL twin with
    HUGEINT sums."""
    import ray as _ray

    spec = {
        "n": pa.int64(),
        "rho": pa.float64(),
    }

    def _empty() -> pa.Table:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})

    def xy(b: pa.Table):
        x = (
            ftext.token_count_batch(b)["n_tokens"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        y = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return x, y

    def hist_partial(b: pa.Table) -> pa.Table:
        x, y = xy(b)
        ux, cx = np.unique(x, return_counts=True)
        uy, cy = np.unique(y, return_counts=True)
        return pa.table(
            {
                "var": pa.array(
                    ["x"] * len(ux) + ["y"] * len(uy), pa.string()
                ),
                "v": pa.array(np.concatenate([ux, uy]), pa.int64()),
                "c": pa.array(
                    np.concatenate([cx, cy]).astype(np.int64), pa.int64()
                ),
            }
        )

    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"]).materialize()
    hist = docs.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    if len(hist) == 0:
        return _empty()
    hist = hist.groupby(["var", "v"], as_index=False)["c"].sum()

    def rank_map(var: str):
        h = hist[hist["var"] == var].sort_values("v")
        v = h["v"].to_numpy(dtype=np.int64)
        c = h["c"].to_numpy(dtype=np.int64)
        cum = np.cumsum(c)
        dr = 2 * (cum - c) + c + 1  # doubled average rank
        return v, dr

    vx, drx = rank_map("x")
    vy, dry = rank_map("y")
    mref = _ray.put((vx, drx, vy, dry))

    def sums_partial(b: pa.Table) -> pa.Table:
        vx_, drx_, vy_, dry_ = _ray.get(mref)
        x, y = xy(b)
        rx = drx_[np.searchsorted(vx_, x)]
        ry = dry_[np.searchsorted(vy_, y)]
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(rx.sum())], pa.int64()),
                "sy": pa.array([int(ry.sum())], pa.int64()),
                "sxx": pa.array([int((rx * rx).sum())], pa.int64()),
                "syy": pa.array([int((ry * ry).sum())], pa.int64()),
                "sxy": pa.array([int((rx * ry).sum())], pa.int64()),
            }
        )

    s = docs.map_batches(sums_partial, batch_format="pyarrow").to_pandas()
    n = int(s["n"].sum())
    if n < 2:
        return _empty()
    sx, sy, sxx, syy, sxy = (
        int(s[c].sum()) for c in ("sx", "sy", "sxx", "syy", "sxy")
    )
    num = n * sxy - sx * sy
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    if den <= 0:
        return _empty()  # a constant variable: ρ undefined (SQL twin agrees)
    import math

    # same double conversion as the SQL twin's sqrt(...::DOUBLE)
    rho = round(float(num) / math.sqrt(float(den)), 6)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "rho": pa.array([rho], pa.float64()),
        }
    )


SQL_SPEARMAN_LEN_TOKENS = r"""
WITH v AS (
  SELECT len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]'))::BIGINT
           AS x,
         n_chars::BIGINT AS y
  FROM documents),
hx AS (SELECT x, count(*)::BIGINT AS c FROM v GROUP BY x),
rx AS (
  SELECT x,
         (2 * (sum(c) OVER (ORDER BY x) - c) + c + 1)::BIGINT AS dr
  FROM hx),
hy AS (SELECT y, count(*)::BIGINT AS c FROM v GROUP BY y),
ry AS (
  SELECT y,
         (2 * (sum(c) OVER (ORDER BY y) - c) + c + 1)::BIGINT AS dr
  FROM hy),
r AS (
  SELECT rx.dr AS a, ry.dr AS b
  FROM v JOIN rx ON v.x = rx.x JOIN ry ON v.y = ry.y),
s AS (
  SELECT count(*)::HUGEINT AS n, sum(a)::HUGEINT AS sx, sum(b)::HUGEINT AS sy,
         sum(a * a)::HUGEINT AS sxx, sum(b * b)::HUGEINT AS syy,
         sum(a * b)::HUGEINT AS sxy
  FROM r)
SELECT n::BIGINT AS n,
       round((n * sxy - sx * sy) * 1.0
             / sqrt(((n * sxx - sx * sx) * (n * syy - sy * sy))::DOUBLE),
             6) AS rho
FROM s
WHERE n >= 2 AND (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
"""


def q_source_lang_entropy(sf_dir: str):
    """Corpus-mix diversity diagnostic: Shannon entropy (nats) of the
    language distribution within each source, plus the majority language
    and its share — the table that says which sources are monolingual
    silos vs mixed.  Each batch forwards ≤ |sources|·|langs| count rows;
    entropy runs on the tiny crosstab.  Ties for the majority language
    break alphabetically in both engines; full SQL twin."""
    import pandas as pd

    def part(b: pa.Table) -> pa.Table:
        df = (
            pd.DataFrame(
                {
                    "source": np.asarray(b["source"].to_pylist(), dtype=object),
                    "lang": np.asarray(b["lang"].to_pylist(), dtype=object),
                }
            )
            .groupby(["source", "lang"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    spec = {
        "source": pa.string(),
        "n_docs": pa.int64(),
        "n_langs": pa.int64(),
        "entropy": pa.float64(),
        "top_lang": pa.string(),
        "top_share": pa.float64(),
    }
    ct = (
        _read(sf_dir, "documents", ["source", "lang"])
        .map_batches(part, batch_format="pyarrow")
        .to_pandas()
    )
    if len(ct) == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    ct = ct.groupby(["source", "lang"], as_index=False)["n"].sum()
    rows = []
    for src, grp in ct.groupby("source", sort=True):
        n = grp["n"].to_numpy(dtype=np.float64)
        tot = n.sum()
        p = n / tot
        ent = float(-(p * np.log(p)).sum())
        g2 = grp.sort_values(["n", "lang"], ascending=[False, True])
        rows.append(
            (
                src,
                int(tot),
                len(grp),
                round(ent, 6),
                g2["lang"].iloc[0],
                round(float(g2["n"].iloc[0]) / tot, 6),
            )
        )
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
            "n_langs": pa.array([r[2] for r in rows], pa.int64()),
            "entropy": pa.array([r[3] for r in rows], pa.float64()),
            "top_lang": pa.array([r[4] for r in rows], pa.string()),
            "top_share": pa.array([r[5] for r in rows], pa.float64()),
        }
    )


SQL_SOURCE_LANG_ENTROPY = r"""
WITH ct AS (
  SELECT source, lang, count(*)::BIGINT AS n
  FROM documents GROUP BY 1, 2),
tot AS (SELECT source, sum(n)::BIGINT AS t FROM ct GROUP BY source),
ent AS (
  SELECT ct.source,
         round(-sum((ct.n * 1.0 / tot.t) * ln(ct.n * 1.0 / tot.t)), 6)
           AS entropy,
         count(*)::BIGINT AS n_langs
  FROM ct JOIN tot USING (source) GROUP BY ct.source),
top AS (
  SELECT source, lang AS top_lang, n,
         row_number() OVER (
           PARTITION BY source ORDER BY n DESC, lang
         ) AS rn
  FROM ct)
SELECT e.source, t.t AS n_docs, e.n_langs, e.entropy,
       top.top_lang, round(top.n * 1.0 / t.t, 6) AS top_share
FROM ent e
JOIN tot t ON t.source = e.source
JOIN top ON top.source = e.source AND top.rn = 1
ORDER BY e.source
"""


def q_chi2_features(sf_dir: str):
    """χ² feature selection (the classic text-classification feature
    ranker): for every token, the chi-squared statistic of the 2×2 table
    (document contains token × document is the target lang 'en'); top-20
    by (χ² desc, token asc).  Per-batch per-class document-frequency
    combiner → ONE coarse token exchange → χ² on integer counts (the
    numerator N(ad−bc)² is exact big-int; only the final division is
    float, rounded).  Full SQL twin."""
    import pandas as pd

    from anansi_ray.arrowds import coarse_agg

    spec = {
        "token": pa.string(),
        "df_en": pa.int64(),
        "df_other": pa.int64(),
        "chi2": pa.float64(),
    }

    def class_df_partial(b: pa.Table) -> pa.Table:
        col = pc.fill_null(b["text"], "")
        toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\W+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = (
            pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(str)
        )
        doc_idx = np.repeat(np.arange(b.num_rows), lens)
        keep = flat != ""
        flat, doc_idx = flat[keep], doc_idx[keep]
        is_en = pc.equal(
            pc.fill_null(b["lang"].combine_chunks().cast(pa.string()), ""),
            "en",
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"token": flat, "doc": doc_idx, "en": is_en[doc_idx]}
        ).drop_duplicates(["token", "doc"])
        g = df.groupby("token")["en"].agg(["sum", "count"]).reset_index()
        return pa.table(
            {
                "token": pa.array(g["token"].to_numpy(dtype=object), pa.string()),
                "df_en": pa.array(
                    g["sum"].to_numpy(dtype=np.int64), pa.int64()
                ),
                "df_all": pa.array(
                    g["count"].to_numpy(dtype=np.int64), pa.int64()
                ),
            }
        )

    docs = _read(sf_dir, "documents", ["text", "lang"])
    counts = coarse_agg(
        docs.map_batches(class_df_partial, batch_format="pyarrow"),
        "token",
        {"df_en": ("sum", "df_en"), "df_all": ("sum", "df_all")},
    ).to_pandas()
    if len(counts) == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})

    def n_partial(b: pa.Table) -> pa.Table:
        is_en = pc.equal(
            pc.fill_null(b["lang"].combine_chunks().cast(pa.string()), ""),
            "en",
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_en": pa.array([int(is_en.sum())], pa.int64()),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        )

    ns = (
        _read(sf_dir, "documents", ["lang"])
        .map_batches(n_partial, batch_format="pyarrow")
        .to_pandas()
    )
    N = int(ns["n"].sum())
    N_en = int(ns["n_en"].sum())
    N_ot = N - N_en
    a = counts["df_en"].to_numpy(dtype=np.int64)
    ab = counts["df_all"].to_numpy(dtype=np.int64)
    b_ = ab - a
    c = N_en - a
    d = N_ot - b_
    num = N * (a.astype(object) * d - b_.astype(object) * c) ** 2
    den = (
        (a + b_).astype(object)
        * (c + d).astype(object)
        * (a + c).astype(object)
        * (b_ + d).astype(object)
    )
    chi2 = np.array(
        [round(float(x) / float(y), 6) if y else 0.0 for x, y in zip(num, den)]
    )
    toks = counts["token"].to_numpy(dtype=str)
    order = np.lexsort((toks, -chi2))[:20]
    return pa.table(
        {
            "token": pa.array(toks[order].astype(object), pa.string()),
            "df_en": pa.array(a[order], pa.int64()),
            "df_other": pa.array(b_[order], pa.int64()),
            "chi2": pa.array(chi2[order], pa.float64()),
        }
    )


SQL_CHI2_FEATURES = r"""
WITH tok AS (
  SELECT DISTINCT doc_id, lang,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\w+')) AS t
  FROM documents),
cnt AS (
  SELECT t AS token,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS df_en,
         count(*)::BIGINT AS df_all
  FROM tok GROUP BY t),
ns AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en
  FROM documents),
x AS (
  SELECT token, df_en, (df_all - df_en) AS df_other,
         (ns.n_en - df_en) AS c, (ns.n - ns.n_en - df_all + df_en) AS d,
         ns.n AS n
  FROM cnt, ns),
stat AS (
  SELECT token, df_en, df_other,
         CASE WHEN (df_en + df_other) * (c + d)
                   * (df_en + c) * (df_other + d) = 0 THEN 0.0
              ELSE round(
                n::HUGEINT
                * (df_en::HUGEINT * d - df_other::HUGEINT * c)
                * (df_en::HUGEINT * d - df_other::HUGEINT * c)
                * 1.0
                / ((df_en + df_other)::HUGEINT * (c + d)
                   * (df_en + c) * (df_other + d)), 6)
         END AS chi2
  FROM x)
SELECT token, df_en, df_other, chi2
FROM stat ORDER BY chi2 DESC, token LIMIT 20
"""


def q_selfjoin_size_cms(sf_dir: str):
    """Join-size estimation from sketches (Alon–Matias–Szegedy F₂ /
    Cormode–Muthukrishnan CMS inner product): the self-join cardinality
    |lineitem ⋈ lineitem on partkey| equals the second frequency moment
    Σ_k deg(k)², which a Count-Min sketch estimates as min_d Σ_w cell²
    — the query-planner primitive for sizing a shuffle join WITHOUT
    running it.  Exact F₂ comes from one coarse degree exchange +
    a Σdeg² partial pass; the sketch needs only per-batch D×W integer
    partials (linear ⇒ merge exactly).  CMS guarantees est ≥ exact.
    Full SQL twin rebuilds both under the shared md5 bucket contract."""
    import hashlib

    from anansi_ray.arrowds import coarse_agg

    D, W = 4, 64

    def cms_partial(b: pa.Table) -> pa.Table:
        k = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(k, return_counts=True)
        M = np.zeros((D, W), np.int64)
        for u, c in zip(uniq, cnt):
            for d in range(D):
                M[d, int(hashlib.md5(f"{d}:{u}".encode()).hexdigest()[:8], 16) % W] += c
        return pa.table(
            {
                "cells": pa.array([list(M.ravel())], pa.list_(pa.int64())),
                "n": pa.array([len(k)], pa.int64()),
            }
        )

    def deg_partial(b: pa.Table) -> pa.Table:
        k = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(k, return_counts=True)
        return pa.table(
            {
                "k": pa.array(uniq, pa.int64()),
                "deg": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_partkey"]).materialize()
    spec = {
        "n_rows": pa.int64(),
        "distinct_keys": pa.int64(),
        "exact_f2": pa.int64(),
        "cms_f2": pa.int64(),
        "rel_err": pa.float64(),
    }
    parts = li.map_batches(cms_partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0 or parts["n"].sum() == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    M = np.sum(
        np.stack([np.asarray(x, np.int64) for x in parts["cells"]]), axis=0
    ).reshape(D, W)
    cms_f2 = int(min(int((M[d].astype(object) ** 2).sum()) for d in range(D)))

    degs = coarse_agg(
        li.map_batches(deg_partial, batch_format="pyarrow"),
        "k",
        {"deg": ("sum", "deg")},
    )

    def f2_partial(b: pa.Table) -> pa.Table:
        d = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "f2": pa.array([int((d * d).sum())], pa.int64()),
                "nk": pa.array([len(d)], pa.int64()),
            }
        )

    f2p = degs.map_batches(f2_partial, batch_format="pyarrow").to_pandas()
    exact = int(f2p["f2"].sum())
    return pa.table(
        {
            "n_rows": pa.array([int(parts["n"].sum())], pa.int64()),
            "distinct_keys": pa.array([int(f2p["nk"].sum())], pa.int64()),
            "exact_f2": pa.array([exact], pa.int64()),
            "cms_f2": pa.array([cms_f2], pa.int64()),
            "rel_err": pa.array(
                [round((cms_f2 - exact) / exact, 6) if exact else 0.0],
                pa.float64(),
            ),
        }
    )


SQL_SELFJOIN_SIZE_CMS = r"""
WITH deg AS (
  SELECT l_partkey AS k, count(*)::BIGINT AS d FROM lineitem GROUP BY 1),
cells AS (
  SELECT dd.d AS row_d,
         ('0x' || substr(md5(dd.d::VARCHAR || ':' || deg.k::VARCHAR), 1, 8))
           ::UBIGINT % 64 AS b,
         sum(deg.d)::HUGEINT AS cell
  FROM deg, generate_series(0, 3) dd(d)
  GROUP BY 1, 2),
est AS (
  SELECT min(s)::BIGINT AS cms_f2
  FROM (SELECT row_d, sum(cell * cell) AS s FROM cells GROUP BY row_d)),
ex AS (
  SELECT sum(d)::BIGINT AS n_rows, count(*)::BIGINT AS distinct_keys,
         sum(d::HUGEINT * d)::BIGINT AS exact_f2
  FROM deg)
SELECT ex.n_rows, ex.distinct_keys, ex.exact_f2, est.cms_f2,
       round((est.cms_f2 - ex.exact_f2) * 1.0 / ex.exact_f2, 6) AS rel_err
FROM ex, est WHERE ex.n_rows > 0
"""


def q_conformal_interval(sf_dir: str):
    """Split-conformal prediction interval for the value-vs-time
    regression (uncertainty quantification): fit the global integer-exact
    least-squares line (the events_regression contract — integer-scaled
    truncating divisions), compute every event's residual in cents, take
    the exact 5th/95th residual quantiles via the bounded histogram
    pattern with INTEGER threshold comparisons (20·cum ≥ tot), and report
    the interval plus its exact empirical coverage.

    Shape: two streaming passes (sums partial, then residual histogram
    partial — bounded by the cents domain), tiny driver finishes; the SQL
    twin replays the identical integer arithmetic end-to-end."""
    from ray.data.aggregate import Min, Sum

    spec = {
        "n": pa.int64(),
        "slope_e9": pa.int64(),
        "intercept_e6": pa.int64(),
        "q05_cents": pa.int64(),
        "q95_cents": pa.int64(),
        "coverage": pa.float64(),
    }

    def _empty() -> pa.Table:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})

    mn = (
        _read(sf_dir, "events", ["ts"])
        .map_batches(
            lambda b: pa.table({"ts": ts_us(b["ts"].combine_chunks())}),
            batch_format="pyarrow",
        )
        .aggregate(Min("ts"))
    )["min(ts)"]
    if mn is None:
        return _empty()
    MIN_US = int(mn)

    def xy(b: pa.Table):
        ts = ts_us(b["ts"].combine_chunks()).to_numpy(zero_copy_only=False)
        x = (ts - MIN_US) // 60_000_000
        y = np.round(
            b["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return x, y

    def sums_partial(b: pa.Table) -> pa.Table:
        x, y = xy(b)
        xx = x * x
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sxx_hi": pa.array([int((xx // 10**9).sum())], pa.int64()),
                "sxx_lo": pa.array([int((xx % 10**9).sum())], pa.int64()),
            }
        )

    ev = _read(sf_dir, "events", ["ts", "value"]).materialize()
    sums = ev.map_batches(sums_partial, batch_format="pyarrow").to_pandas()
    if len(sums) == 0 or sums["n"].sum() == 0:
        return _empty()
    n = int(sums["n"].sum())
    sx, sy, sxy = (int(sums[c].sum()) for c in ("sx", "sy", "sxy"))
    sxx = int(sums["sxx_hi"].sum()) * 10**9 + int(sums["sxx_lo"].sum())

    def tdiv(a: int, b: int) -> int:  # truncating division (SQL `//`)
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    if den == 0:
        return _empty()
    slope_e9 = tdiv(10**9 * num, den)
    intercept_e6 = tdiv(10**6 * (sy * den - num * sx), den * n)

    def resid_partial(b: pa.Table) -> pa.Table:
        x, y = xy(b)
        scaled = y * 10**9 - (slope_e9 * x + intercept_e6 * 1000)
        # exact truncating integer division (float / would misround near
        # exact multiples); magnitudes stay well inside int64
        q = np.abs(scaled) // 10**9
        r = np.where(scaled < 0, -q, q).astype(np.int64)
        uniq, cnt = np.unique(r, return_counts=True)
        return pa.table(
            {
                "r": pa.array(uniq, pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ev.map_batches(resid_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("r", as_index=False)["c"]
        .sum()
        .sort_values("r", ignore_index=True)
    )
    v = hist["r"].to_numpy(dtype=np.int64)
    c = hist["c"].to_numpy(dtype=np.int64)
    cum = np.cumsum(c)
    tot = int(cum[-1])
    q05 = int(v[np.searchsorted(20 * cum, tot, side="left")])
    q95 = int(v[np.searchsorted(20 * cum, 19 * tot, side="left")])
    inside = int(c[(v >= q05) & (v <= q95)].sum())
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "slope_e9": pa.array([slope_e9], pa.int64()),
            "intercept_e6": pa.array([intercept_e6], pa.int64()),
            "q05_cents": pa.array([q05], pa.int64()),
            "q95_cents": pa.array([q95], pa.int64()),
            "coverage": pa.array([round(inside / tot, 6)], pa.float64()),
        }
    )


SQL_CONFORMAL_INTERVAL = """
WITH b AS (SELECT min(epoch_us(ts)) AS mn FROM events),
p AS (SELECT (epoch_us(ts) - mn) // 60000000 AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events, b),
s AS (SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
             sum(y)::HUGEINT AS sy, sum(x * y)::HUGEINT AS sxy,
             sum(x::HUGEINT * x) AS sxx
      FROM p),
coef AS (
  SELECT n, sx, sy,
         (1000000000::HUGEINT * (n * sxy - sx * sy))
           // (n * sxx - sx * sx) AS slope_e9,
         (1000000::HUGEINT * (sy * (n * sxx - sx * sx)
                              - (n * sxy - sx * sy) * sx))
           // ((n * sxx - sx * sx) * n) AS intercept_e6
  FROM s WHERE n * sxx - sx * sx != 0),
resid AS (
  SELECT ((p.y::HUGEINT * 1000000000
           - (coef.slope_e9 * p.x + coef.intercept_e6 * 1000))
          // 1000000000)::BIGINT AS r
  FROM p, coef),
hist AS (SELECT r, count(*)::BIGINT AS c FROM resid GROUP BY r),
cumed AS (
  SELECT r, c,
         sum(c) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)::BIGINT AS cum
  FROM hist),
tot AS (SELECT sum(c)::BIGINT AS t FROM hist),
qs AS (
  SELECT (SELECT min(r) FROM cumed, tot WHERE 20 * cum >= t) AS q05,
         (SELECT min(r) FROM cumed, tot WHERE 20 * cum >= 19 * t) AS q95)
SELECT (SELECT t FROM tot) AS n,
       coef.slope_e9::BIGINT AS slope_e9,
       coef.intercept_e6::BIGINT AS intercept_e6,
       qs.q05 AS q05_cents, qs.q95 AS q95_cents,
       round((SELECT sum(c) FROM hist WHERE r >= qs.q05 AND r <= qs.q95)
             * 1.0 / (SELECT t FROM tot), 6) AS coverage
FROM coef, qs
"""


def q_region_revenue(sf_dir: str):
    """Snowflake/star join (TPC-H Q5 shape): revenue per region through the
    dimension chain region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem.

    Scale shape: the CATALOG dims (region, nation — dozens of rows) compose
    driver-side into one nationkey→region map broadcast via ``ray.put`` and
    probed block-locally with ``pc.index_in`` (customer is tagged with its
    region WITHOUT a shuffle — at 100 TB customer is a fact, not a
    broadcastable dim).  The two fact⋈fact hops (orders⋈customer on
    custkey, lineitem⋈orders on orderkey) are explicit co-partitioned
    exchanges with revenue pre-computed per lineitem batch and the final
    aggregate combined per bucket BEFORE the tiny region rollup."""
    import ray

    B = 32

    nat = _stable(
        _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas(),
        {"n_nationkey": "int64", "n_regionkey": "int64"},
    )
    reg = _stable(
        _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas(),
        {"r_regionkey": "int64", "r_name": "object"},
    )
    dim = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "r_name"]
    ]
    dim_ref = ray.put(
        pa.Table.from_pandas(dim, preserve_index=False).combine_chunks()
    )

    def tag_customer(b: pa.Table) -> pa.Table:
        d = ray.get(dim_ref)
        idx = pc.index_in(b["c_nationkey"], d["n_nationkey"])
        region = pc.fill_null(d["r_name"].combine_chunks().take(idx), "")
        key = b["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b["c_custkey"],
                "bucket": pa.array((key % B).astype(np.int32), pa.int32()),
                "region": region,
                "carry": pa.array(np.zeros(len(key), np.int64), pa.int64()),
                "side": pa.array(["c"] * len(key), pa.string()),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        key = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b["o_custkey"],
                "bucket": pa.array((key % B).astype(np.int32), pa.int32()),
                "region": pa.array([None] * len(key), pa.string()),
                "carry": b["o_orderkey"],
                "side": pa.array(["o"] * len(key), pa.string()),
            }
        )

    def join_cust_orders(group: pa.Table) -> pa.Table:
        # inner join on custkey; emit (orderkey, region) re-tagged for hop 2
        side = group["side"].to_numpy(zero_copy_only=False)
        k = group["key"].to_numpy(zero_copy_only=False)
        cm = side == "c"
        ck, creg = k[cm], group["region"].to_numpy(zero_copy_only=False)[cm]
        om = side == "o"
        ok, ocarry = k[om], group["carry"].to_numpy(zero_copy_only=False)[om]
        order = np.argsort(ck, kind="stable")
        pos = np.searchsorted(ck[order], ok)
        pos = np.clip(pos, 0, max(len(ck) - 1, 0))
        hit = (len(ck) > 0) & (ck[order][pos] == ok) if len(ck) else np.zeros(
            len(ok), bool
        )
        okey = ocarry[hit]
        oreg = creg[order][pos[hit]] if len(ck) else creg[:0]
        return pa.table(
            {
                "key": pa.array(okey, pa.int64()),
                "bucket": pa.array((okey % B).astype(np.int32), pa.int32()),
                "region": pa.array(oreg, pa.string()),
                "revenue": pa.array(np.full(len(okey), np.nan), pa.float64()),
                "side": pa.array(["o"] * len(okey), pa.string()),
            }
        )

    def tag_lineitem(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        key = b["l_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b["l_orderkey"],
                "bucket": pa.array((key % B).astype(np.int32), pa.int32()),
                "region": pa.array([None] * len(key), pa.string()),
                "revenue": rev,
                "side": pa.array(["l"] * len(key), pa.string()),
            }
        )

    def join_orders_lineitem(group: pa.Table) -> pa.Table:
        # inner join on orderkey + per-bucket partial aggregate by region
        side = group["side"].to_numpy(zero_copy_only=False)
        k = group["key"].to_numpy(zero_copy_only=False)
        om = side == "o"
        ok, oreg = k[om], group["region"].to_numpy(zero_copy_only=False)[om]
        lm = side == "l"
        lk, lrev = k[lm], group["revenue"].to_numpy(zero_copy_only=False)[lm]
        order = np.argsort(ok, kind="stable")
        pos = np.searchsorted(ok[order], lk)
        pos = np.clip(pos, 0, max(len(ok) - 1, 0))
        hit = (ok[order][pos] == lk) if len(ok) else np.zeros(len(lk), bool)
        regs = oreg[order][pos[hit]] if len(ok) else oreg[:0]
        revs = lrev[hit]
        uniq, inv = np.unique(regs, return_inverse=True)
        n = np.bincount(inv).astype(np.int64) if len(uniq) else np.zeros(0, np.int64)
        s = np.zeros(len(uniq))
        np.add.at(s, inv, revs)
        return pa.table(
            {
                "r_name": pa.array(uniq, pa.string()),
                "revenue": pa.array(s, pa.float64()),
                "n_items": pa.array(n, pa.int64()),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        tag_customer, batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        tag_orders, batch_format="pyarrow"
    )
    hop1 = cust.union(orders).groupby("bucket").map_groups(
        join_cust_orders, batch_format="pyarrow"
    )
    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(tag_lineitem, batch_format="pyarrow")
    partials = (
        hop1.union(li)
        .groupby("bucket")
        .map_groups(join_orders_lineitem, batch_format="pyarrow")
        .to_pandas()
    )
    partials = _stable(
        partials, {"r_name": "object", "revenue": "float64", "n_items": "int64"}
    )
    out = partials.groupby("r_name", as_index=False).agg(
        revenue=("revenue", "sum"), n_items=("n_items", "sum")
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("r_name"), preserve_index=False)


SQL_REGION_REVENUE = """
SELECT r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)::BIGINT AS n_items
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey   = c_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
GROUP BY 1 ORDER BY 1
"""


def q_link_triangles(sf_dir: str):
    """Distributed triangle enumeration (graph analytics beyond
    PageRank/CC): list every triangle a<b<c of a deterministic link graph
    synthesized from doc_id — edge families (i, i+1), (i, i+2) and
    (i, 3i+7) mod n guarantee ≥n triangles so the oracle is non-trivial.

    Scale shape (node-iterator): edges normalize u<v block-locally and
    deduplicate with ONE (u,v) groupby; wedge generation partitions by
    u%P and emits neighbor pairs per vertex with a degree-bucketed
    vectorized kernel (no per-vertex Python — wedge count is bounded by
    Σ d(d-1)/2, the algorithm's output size); the closing-edge check is a
    second co-partitioned exchange on the packed (b,c) key with an
    ``np.isin`` membership probe.  Key packing uses u*(n+1)+v — at
    10^10 vertices the pack switches to 2×int64 columns, same plan."""
    P = 32

    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(b: pa.Table) -> pa.Table:
        i = b["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        x = np.concatenate([i, i, i])
        y = np.concatenate([(i + 1) % n, (i + 2) % n, (3 * i + 7) % n])
        u, v = np.minimum(x, y), np.maximum(x, y)
        keep = u != v
        u, v = u[keep], v[keep]
        key = np.unique(u * np.int64(n + 1) + v)
        return pa.table(
            {"u": pa.array(key // (n + 1), pa.int64()), "v": pa.array(key % (n + 1), pa.int64())}
        )

    edge_ds = (
        docs.map_batches(edges, batch_format="pyarrow").groupby(["u", "v"]).count()
    )

    def tag_u(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((u % P).astype(np.int32), pa.int32()),
                "u": b["u"],
                "v": b["v"],
            }
        )

    empty_wedge = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
        }
    )

    def wedges(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_wedge
        u = group["u"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        degs = np.diff(np.r_[starts, len(u)])
        aa, bb, cc = [], [], []
        for d in np.unique(degs):  # loop over DEGREE VALUES, not vertices
            if d < 2:
                continue
            runs = starts[degs == d]
            nb = v[runs[:, None] + np.arange(d)]  # (n_runs, d) neighbor matrix
            ii, jj = np.triu_indices(d, k=1)
            aa.append(np.repeat(u[runs], len(ii)))
            bb.append(nb[:, ii].ravel())
            cc.append(nb[:, jj].ravel())
        if not aa:
            return empty_wedge
        return pa.table(
            {
                "a": pa.array(np.concatenate(aa), pa.int64()),
                "b": pa.array(np.concatenate(bb), pa.int64()),
                "c": pa.array(np.concatenate(cc), pa.int64()),
            }
        )

    wedge_ds = (
        edge_ds.map_batches(tag_u, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wedges, batch_format="pyarrow")
    )

    def tag_wedge(b: pa.Table) -> pa.Table:
        bb = b["b"].to_numpy(zero_copy_only=False)
        cc = b["c"].to_numpy(zero_copy_only=False)
        key = bb * np.int64(n + 1) + cc
        return pa.table(
            {
                "part": pa.array((key % P).astype(np.int32), pa.int32()),
                "key": pa.array(key, pa.int64()),
                "a": b["a"],
                "side": pa.array(["w"] * b.num_rows, pa.string()),
            }
        )

    def tag_edge(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        key = u * np.int64(n + 1) + v
        return pa.table(
            {
                "part": pa.array((key % P).astype(np.int32), pa.int32()),
                "key": pa.array(key, pa.int64()),
                "a": pa.array(np.full(len(u), -1, np.int64), pa.int64()),
                "side": pa.array(["e"] * len(u), pa.string()),
            }
        )

    def close_check(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        key = group["key"].to_numpy(zero_copy_only=False)
        wm = side == "w"
        keep = wm & np.isin(key, key[side == "e"])
        a = group["a"].to_numpy(zero_copy_only=False)[keep]
        k = key[keep]
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(k // (n + 1), pa.int64()),
                "c": pa.array(k % (n + 1), pa.int64()),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    out = _stable(
        drop_empty_blocks(
            wedge_ds.map_batches(tag_wedge, batch_format="pyarrow")
            .union(edge_ds.map_batches(tag_edge, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(close_check, batch_format="pyarrow")
            .materialize()
        ).to_pandas(),
        {"a": "int64", "b": "int64", "c": "int64"},
    ).sort_values(["a", "b", "c"])
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_LINK_TRIANGLES = """
WITH nn AS (SELECT count(*) AS n FROM documents),
raw AS (
  SELECT doc_id AS x, (doc_id + 1) % n AS y FROM documents, nn
  UNION ALL SELECT doc_id, (doc_id + 2) % n FROM documents, nn
  UNION ALL SELECT doc_id, (3 * doc_id + 7) % n FROM documents, nn
),
e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
      FROM raw WHERE x <> y)
SELECT e1.u AS a, e1.v AS b, e2.v AS c
FROM e e1
JOIN e e2 ON e2.u = e1.v
JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
ORDER BY 1, 2, 3
"""


def q_orders_bloom_filter(sf_dir: str):
    """Bloom-filter–pruned semi join (the scale technique for
    big-probe ⋈ selective-build): orders of customers in the BUILDING
    segment.  The build side collapses per block to ONE 16 KiB bitmap row
    (m=2^17 bits, k=4 Kirsch–Mitzenmacher probes from two splitmix64
    streams); the driver ORs the block bitmaps (traffic = #blocks ×
    16 KiB, independent of build rows) and broadcasts once via
    ``ray.put``.  The probe side tests bits block-locally — only bloom
    SURVIVORS (true matches + ~0.1% false positives) enter the exact
    co-partitioned ``np.isin`` verification exchange, so the shuffle
    moves ~selectivity of the fact table instead of all of it.  The
    result is EXACT (bloom prunes, verify decides)."""
    import ray

    M_BITS = 1 << 17
    MASK = np.uint64(M_BITS - 1)
    K = 4
    P = 32

    def _mix(x: np.ndarray, salt: int) -> np.ndarray:
        z = x.astype(np.uint64) + np.uint64(salt)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    def _positions(keys: np.ndarray) -> np.ndarray:
        h1 = _mix(keys, 0x9E3779B97F4A7C15)
        h2 = _mix(keys, 0xD1B54A32D192ED03) | np.uint64(1)
        return np.stack([(h1 + np.uint64(i) * h2) & MASK for i in range(K)])

    def build_bitmap(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["c_mktsegment"], "BUILDING"))
        keys = t["c_custkey"].to_numpy(zero_copy_only=False)
        words = np.zeros(M_BITS // 64, np.uint64)
        if len(keys):
            pos = _positions(keys).ravel()
            np.bitwise_or.at(
                words,
                (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return pa.table({"bitmap": pa.array([words.tobytes()], pa.binary())})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    block_maps = cust.map_batches(build_bitmap, batch_format="pyarrow").take_all()
    bloom = np.zeros(M_BITS // 64, np.uint64)
    for r in block_maps:  # #blocks rows, 16 KiB each — catalog traffic
        bloom |= np.frombuffer(r["bitmap"], np.uint64)
    bloom_ref = ray.put(bloom)

    def probe(b: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)
        keys = b["o_custkey"].to_numpy(zero_copy_only=False)
        pos = _positions(keys)
        ok = np.ones(len(keys), bool)
        for i in range(K):
            word = bm[(pos[i] >> np.uint64(6)).astype(np.int64)]
            ok &= ((word >> (pos[i] & np.uint64(63))) & np.uint64(1)).astype(bool)
        t = b.filter(pa.array(ok))
        k = t["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((k % P).astype(np.int32), pa.int32()),
                "k": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "o_totalprice": t["o_totalprice"],
                "side": pa.array(["p"] * t.num_rows, pa.string()),
            }
        )

    def tag_build(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["c_mktsegment"], "BUILDING"))
        k = t["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((k % P).astype(np.int32), pa.int32()),
                "k": t["c_custkey"],
                "o_orderkey": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                "o_totalprice": pa.array(np.zeros(len(k)), pa.float64()),
                "side": pa.array(["b"] * len(k), pa.string()),
            }
        )

    empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "o_custkey": pa.array([], pa.int64()),
            "o_totalprice": pa.array([], pa.float64()),
        }
    )

    def verify(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        side = group["side"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False)
        keep = (side == "p") & np.isin(k, k[side == "b"])
        t = group.filter(pa.array(keep))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["k"],
                "o_totalprice": t["o_totalprice"],
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks, stable_pandas

    cands = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(probe, batch_format="pyarrow")
    out = _stable_t(
        stable_pandas(
            drop_empty_blocks(
                cands.union(cust.map_batches(tag_build, batch_format="pyarrow"))
                .groupby("part")
                .map_groups(verify, batch_format="pyarrow")
                .materialize()
            )
        ),
        empty,
    ).sort_values("o_orderkey")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_ORDERS_BLOOM_FILTER = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey
                AND c.c_mktsegment = 'BUILDING')
ORDER BY o_orderkey
"""


def q_events_gap_fill(sf_dir: str):
    """Time-series densification (gap fill): hourly event counts per type
    with MISSING hours emitted as explicit zeros over the corpus'
    [min,max] hour span — the input to any windowed model that cannot
    tolerate implicit gaps.

    Scale shape: a per-batch (type, hour) count combiner collapses every
    block to ≤ |types|×|hours-in-block| rows before ONE groupby; the
    grid completion runs on the CATALOG-sized result (|types| × corpus
    hours), never on events."""
    from ray.data.aggregate import Sum

    HOUR_US = 3_600_000_000

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        hr = (
            ts_us(b["ts"].combine_chunks()).to_numpy(zero_copy_only=False)
            // HOUR_US
        )
        types, tinv = np.unique(et, return_inverse=True)
        hmin = hr.min() if len(hr) else 0
        span = int(hr.max() - hmin) + 1 if len(hr) else 1
        key, inv = np.unique(tinv * span + (hr - hmin), return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        first = np.full(len(key), np.iinfo(np.int64).max)
        np.minimum.at(first, inv, np.arange(len(inv)))
        return pa.table(
            {
                "event_type": pa.array(et[first], pa.string()),
                "hour_b": pa.array(hr[first], pa.int64()),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    hist = (
        _read(sf_dir, "events", ["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour_b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    hist = _stable(
        hist, {"event_type": "object", "hour_b": "int64", "n": "int64"}
    )
    if len(hist) == 0:
        # SQL twin on empty: generate_series(NULL, NULL) unnests to zero
        # rows, so the gap-filled grid is itself empty
        return pa.Table.from_pandas(hist, preserve_index=False)
    lo, hi = int(hist["hour_b"].min()), int(hist["hour_b"].max())
    types = sorted(hist["event_type"].unique())
    hours = np.arange(lo, hi + 1, dtype=np.int64)
    import pandas as pd

    grid = pd.DataFrame(
        {
            "event_type": np.repeat(types, len(hours)),
            "hour_b": np.tile(hours, len(types)),
        }
    )
    out = grid.merge(hist, on=["event_type", "hour_b"], how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    return pa.Table.from_pandas(
        out.sort_values(["event_type", "hour_b"]), preserve_index=False
    )


SQL_EVENTS_GAP_FILL = """
WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour_b,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
b AS (SELECT min(hour_b) AS lo, max(hour_b) AS hi FROM c),
h AS (SELECT unnest(generate_series(lo, hi)) AS hour_b FROM b),
t AS (SELECT DISTINCT event_type FROM events)
SELECT t.event_type, h.hour_b, coalesce(c.n, 0)::BIGINT AS n
FROM t CROSS JOIN h
LEFT JOIN c ON c.event_type = t.event_type AND c.hour_b = h.hour_b
ORDER BY 1, 2
"""


def q_customer_median_order(sf_dir: str):
    """HIGH-cardinality grouped exact median (holistic aggregate): the
    lower median order value per customer.  Unlike the algebraic family
    (sum/mean/variance combine associatively) a median cannot pre-reduce,
    so the honest distributed plan is ONE custkey-hash exchange of
    (custkey, cents) pairs followed by a per-partition vectorized kernel:
    lexsort, run boundaries, element at off + (n-1)//2 — no per-group
    Python, no global sort.  Contrast with events_quantiles (LOW-
    cardinality groups → histogram partials beat the exchange)."""
    P = 32

    def tag(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False)
        cents = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64()
        )
        return pa.table(
            {
                "part": pa.array((k % P).astype(np.int32), pa.int32()),
                "o_custkey": b["o_custkey"],
                "cents": cents,
            }
        )

    empty = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
            "median_cents": pa.array([], pa.int64()),
        }
    )

    def median_kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        k = group["o_custkey"].to_numpy(zero_copy_only=False)
        c = group["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((c, k))
        k, c = k[order], c[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        n = np.diff(np.r_[starts, len(k)])
        med = c[starts + (n - 1) // 2]
        return pa.table(
            {
                "o_custkey": pa.array(k[starts], pa.int64()),
                "n_orders": pa.array(n.astype(np.int64), pa.int64()),
                "median_cents": pa.array(med, pa.int64()),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    out = _stable_t(
        drop_empty_blocks(
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(median_kernel, batch_format="pyarrow")
            .materialize()
        ).to_pandas(),
        empty,
    ).sort_values("o_custkey")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_CUSTOMER_MEDIAN_ORDER = """
SELECT o_custkey, count(*)::BIGINT AS n_orders,
       percentile_disc(0.5) WITHIN GROUP
         (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
         AS median_cents
FROM orders GROUP BY 1 ORDER BY 1
"""


def q_user_active_time(sf_dir: str):
    """Interval union / coverage (merge overlapping intervals): each event
    opens a 30-minute activity window; per user, overlapping-or-touching
    windows merge and the output is (n_intervals, covered_us) — the
    calendar-coverage operator behind billing, SLA and dwell-time
    pipelines.

    Scale shape: ONE user-hash exchange, then a per-partition vectorized
    sweep — lexsort by (user, start), running max of interval end with
    per-user resets (masked ``np.maximum.accumulate``), an island starts
    where start > previous running end; per-island coverage = island end −
    island start, summed per user with ``np.add.at``.  No per-user Python,
    no pair materialization.  The kernel handles VARIABLE-length intervals
    (the reset uses band-offset accumulation; band product is bounded by
    users-per-partition × corpus span in µs — raise P to keep it inside
    int64, the partition count is the natural knob at scale)."""
    P = 32
    LEN_US = 1_800_000_000

    def tag(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        s = ts_us(b["ts"].combine_chunks()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((u % P).astype(np.int32), pa.int32()),
                "user_id": b["user_id"],
                "s": pa.array(s, pa.int64()),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_intervals": pa.array([], pa.int64()),
            "covered_us": pa.array([], pa.int64()),
        }
    )

    def sweep(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        s = group["s"].to_numpy(zero_copy_only=False)
        uu, n_int, covered = fevents.interval_union_sweep(u, s, s + LEN_US)
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "n_intervals": pa.array(n_int, pa.int64()),
                "covered_us": pa.array(covered, pa.int64()),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    out = _stable_t(
        drop_empty_blocks(
            _read(sf_dir, "events", ["user_id", "ts"])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(sweep, batch_format="pyarrow")
            .materialize()
        ).to_pandas(),
        empty,
    ).sort_values("user_id")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_USER_ACTIVE_TIME = """
WITH p AS (SELECT user_id, epoch_us(ts) AS s,
                  epoch_us(ts) + 1800000000 AS e
           FROM events),
w AS (SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmax
      FROM p),
g AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS ni
      FROM w),
i AS (SELECT *, sum(ni) OVER (PARTITION BY user_id ORDER BY s
                              ROWS UNBOUNDED PRECEDING) AS island
      FROM g),
isl AS (SELECT user_id, island, max(e) - min(s) AS cov
        FROM i GROUP BY 1, 2)
SELECT user_id, count(*)::BIGINT AS n_intervals,
       sum(cov)::BIGINT AS covered_us
FROM isl GROUP BY 1 ORDER BY 1
"""


def q_events_moving_avg(sf_dir: str):
    """Per-key window-frame aggregate (SUM/COUNT OVER ROWS BETWEEN 2
    PRECEDING AND CURRENT ROW): the rolling-feature operator behind
    fraud/velocity features.  Values are fixed-pointed to integer
    10^-4 units on BOTH sides so the frame sum is bit-exact regardless
    of summation order.

    Scale shape: ONE user-hash exchange, then a per-partition vectorized
    kernel — lexsort by (user, ts, event_id), inclusive cumsum, frame sum
    = cs[i] − excl_cs[max(run_start, i−2)] — no per-row Python, no
    global sort; the frame never crosses a partition because the
    partition key IS the window's PARTITION BY key."""
    P = 32

    def tag(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        ts = ts_us(b["ts"].combine_chunks()).to_numpy(zero_copy_only=False)
        v = pc.cast(
            pc.round(pc.multiply(b["value"], 10000.0)), pa.int64()
        )
        return pa.table(
            {
                "part": pa.array((u % P).astype(np.int32), pa.int32()),
                "user_id": b["user_id"],
                "ts_us": pa.array(ts, pa.int64()),
                "event_id": b["event_id"],
                "v": v,
            }
        )

    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "w_sum": pa.array([], pa.int64()),
            "w_n": pa.array([], pa.int64()),
        }
    )

    def frame_kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts_us"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, eid, v = u[order], eid[order], v[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        run_start = np.repeat(starts, np.diff(np.r_[starts, n]))
        cs = np.cumsum(v)
        lo = np.maximum(run_start, np.arange(n, dtype=np.int64) - 2)
        excl = cs[lo] - v[lo]
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "w_sum": pa.array(cs - excl, pa.int64()),
                "w_n": pa.array(
                    np.arange(n, dtype=np.int64) - lo + 1, pa.int64()
                ),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    out = _stable_t(
        drop_empty_blocks(
            _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(frame_kernel, batch_format="pyarrow")
            .materialize()
        ).to_pandas(),
        empty,
    ).sort_values("event_id")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_EVENTS_MOVING_AVG = """
WITH p AS (SELECT event_id, user_id, ts,
                  CAST(round(value * 10000) AS BIGINT) AS v
           FROM events)
SELECT event_id,
       sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS w_sum,
       count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)::BIGINT
         AS w_n
FROM p ORDER BY event_id
"""


def q_sliding_distinct_users(sf_dir: str):
    """Exact DISTINCT-count over OVERLAPPING windows (3-hour window, 1-hour
    step): the classic trap where summing per-hour distincts is WRONG —
    the correct distributed plan dedups (window, user) pairs.

    Scale shape: per-batch (user, hour) dedup combiner → ×3 window
    expansion → ONE pair-hash exchange whose kernel dedups pairs with
    np.unique and emits per-window partial counts (a pair lives in
    exactly one partition, so partials are disjoint) → tiny
    groupby(window) sum.  The composite pair key is (window << 31 | user)
    — at a 10^10-user corpus it becomes a 128-bit hash, same layout."""
    P = 32
    HOUR = 3_600_000_000

    def tag(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        h = (
            ts_us(b["ts"].combine_chunks()).to_numpy(zero_copy_only=False)
            // HOUR
        )
        pair = np.unique(h * np.int64(1) * (np.int64(1) << 31) + u)
        hh, uu = pair >> 31, pair & ((np.int64(1) << 31) - 1)
        # window w covers hours [w, w+2] → hour h belongs to w ∈ {h-2..h}
        w = np.concatenate([hh, hh - 1, hh - 2])
        uu3 = np.concatenate([uu, uu, uu])
        key = np.unique((w << 31) + uu3)
        return pa.table(
            {
                "part": pa.array((key % P).astype(np.int32), pa.int32()),
                "key": pa.array(key, pa.int64()),
            }
        )

    empty = pa.table(
        {"w": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )

    def dedup_count(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        key = np.unique(group["key"].to_numpy(zero_copy_only=False))
        w = key >> 31
        uw, cnt = np.unique(w, return_counts=True)
        return pa.table(
            {
                "w": pa.array(uw, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    from anansi_ray.arrowds import drop_empty_blocks

    from anansi_ray.arrowds import coarse_agg

    out = coarse_agg(
        drop_empty_blocks(
            _read(sf_dir, "events", ["ts", "user_id"])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(dedup_count, batch_format="pyarrow")
            .materialize()
        ),
        "w",
        {"n_users": ("sum", "n")},
    ).to_pandas()
    out = _stable(out, {"w": "int64", "n_users": "int64"}).sort_values("w")
    out["window_us"] = out.pop("w").astype("int64") * HOUR
    out["n_users"] = out["n_users"].astype("int64")
    return pa.Table.from_pandas(
        out[["window_us", "n_users"]], preserve_index=False
    )


SQL_SLIDING_DISTINCT_USERS = """
WITH e AS (SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS h
           FROM events),
w AS (SELECT user_id, h - i AS w FROM e, range(3) t(i))
SELECT w * 3600000000 AS window_us,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM w GROUP BY 1 ORDER BY 1
"""


def q_link_khop(sf_dir: str):
    """K-hop BFS reachability on the synthetic link graph (functions/
    graph.py khop_reach): per root (doc_id % 53 == 0), distinct nodes
    within ≤3 hops — frontier-only exchanges against a laid-out-once
    edge list, visited-set anti-join per superstep."""
    from anansi_ray.functions.graph import khop_reach

    docs = _read(sf_dir, "documents", ["doc_id"])
    n_docs = docs.count()
    return khop_reach(docs, n_docs, hops=3, mod=53)


SQL_LINK_KHOP = """
WITH nn AS (SELECT count(*) AS nd FROM documents),
e AS (SELECT doc_id AS s, (2 * doc_id + 1) % nd AS d FROM documents, nn
      UNION ALL
      SELECT doc_id, (3 * doc_id + 7) % nd FROM documents, nn),
h0 AS (SELECT doc_id AS root, doc_id AS node FROM documents
       WHERE doc_id % 53 = 0),
h1 AS (SELECT DISTINCT root, e.d AS node FROM h0 JOIN e ON e.s = h0.node),
h2 AS (SELECT DISTINCT root, e.d AS node FROM h1 JOIN e ON e.s = h1.node),
h3 AS (SELECT DISTINCT root, e.d AS node FROM h2 JOIN e ON e.s = h2.node),
a AS (SELECT root, node FROM h0 UNION SELECT root, node FROM h1
      UNION SELECT root, node FROM h2 UNION SELECT root, node FROM h3)
SELECT root, count(*)::BIGINT AS n_reach FROM a GROUP BY 1 ORDER BY 1
"""


def q_bigram_lm_score(sf_dir: str):
    """Bigram-LM corpus-frequency scoring (the n-gram-LM quality signal of
    CCNet/Gopher-style filtering, integer-exact): score(doc) = Σ over the
    doc's adjacent word pairs of the CORPUS-wide count of that pair.

    Scale shape: pass 1 emits per-batch corpus partials (functions/text.py
    bigram_partial) straight into the join exchange — all partials for a
    bigram hash to one partition, so the global count is combined
    IN-KERNEL (never a sorted aggregate over the vocabulary); pass 2
    re-reads docs as (doc_id, bigram, m) combiner rows (bigram_doc_pairs);
    the join is ONE coarse exchange on a deterministic siphash of the
    bigram string — inside each partition a sorted-array searchsorted
    probe maps pair → corpus count, emitting per-doc partials; a final
    coarse doc-part exchange combines them.  Nothing token-stream-sized
    crosses the wire; both exchanges carry vocabulary-bounded rows."""
    import pandas as pd

    from anansi_ray.arrowds import drop_empty_blocks

    P = 32

    def tag_counts(b: pa.Table) -> pa.Table:
        bg = b["bigram"].to_pandas()
        h = pd.util.hash_array(bg.to_numpy(dtype=object))
        return pa.table(
            {
                "part": pa.array((h % P).astype(np.int32), pa.int32()),
                "bigram": b["bigram"],
                "doc_id": pa.array(np.full(len(bg), -1, np.int64), pa.int64()),
                "m": b["n"].cast(pa.int64()),
            }
        )

    def tag_docs(b: pa.Table) -> pa.Table:
        pairs = ftext.bigram_doc_pairs(b)
        bg = pairs["bigram"].to_pandas()
        h = pd.util.hash_array(bg.to_numpy(dtype=object))
        return pa.table(
            {
                "part": pa.array((h % P).astype(np.int32), pa.int32()),
                "bigram": pairs["bigram"],
                "doc_id": pairs["doc_id"],
                "m": pairs["m"],
            }
        )

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
    )

    def probe_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        m = g["m"].to_numpy(zero_copy_only=False)
        bg = g["bigram"].to_pandas().to_numpy(dtype=object)
        is_c = doc == -1
        order = np.argsort(bg[is_c], kind="stable")
        ck_s, cv_s = bg[is_c][order], m[is_c][order]
        # combine per-batch corpus partials: every partial for a bigram
        # lands in this part, so its global count is a run sum here
        new = np.r_[True, ck_s[1:] != ck_s[:-1]] if len(ck_s) else np.zeros(0, bool)
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        ck = ck_s[starts]
        cv = np.zeros(len(starts), np.int64)
        np.add.at(cv, run_id, cv_s)
        dk, dd, dm = bg[~is_c], doc[~is_c], m[~is_c]
        pos = np.searchsorted(ck, dk)
        # every doc bigram exists in the corpus counts by construction
        contrib = dm * cv[pos]
        ud, inv = np.unique(dd, return_inverse=True)
        s = np.zeros(len(ud), np.int64)
        np.add.at(s, inv, contrib)
        return pa.table(
            {"doc_id": pa.array(ud, pa.int64()), "s": pa.array(s, pa.int64())}
        )

    def tag_doc_part(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "dpart", pa.array((d % P).astype(np.int32), pa.int32())
        )

    final_empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "lm_hits": pa.array([], pa.int64())}
    )

    def sum_doc_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return final_empty
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        s = g["s"].to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        tot = np.zeros(len(ud), np.int64)
        np.add.at(tot, inv, s)
        return pa.table(
            {
                "doc_id": pa.array(ud, pa.int64()),
                "lm_hits": pa.array(tot, pa.int64()),
            }
        )

    counts_src = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(ftext.bigram_partial, batch_format="pyarrow")
        .map_batches(tag_counts, batch_format="pyarrow")
    )
    out = (
        drop_empty_blocks(
            counts_src.union(
                _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
                    tag_docs, batch_format="pyarrow"
                )
            )
            .groupby("part")
            .map_groups(probe_part, batch_format="pyarrow")
            .materialize()
        )
        .map_batches(tag_doc_part, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(sum_doc_part, batch_format="pyarrow")
        .to_pandas()
    )
    out = _stable(out, {"doc_id": "int64", "lm_hits": "int64"}).sort_values(
        "doc_id"
    )
    out["lm_hits"] = out["lm_hits"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_BIGRAM_LM_SCORE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
b AS (SELECT doc_id,
             unnest(ws[1:len(ws)-1]) || ' ' || unnest(ws[2:len(ws)]) AS bigram
      FROM w),
c AS (SELECT bigram, count(*) AS n FROM b GROUP BY 1)
SELECT b.doc_id, sum(c.n)::BIGINT AS lm_hits
FROM b JOIN c USING (bigram) GROUP BY 1 ORDER BY 1
"""


def q_heavy_hitter_words(sf_dir: str):
    """EXACT heavy hitters (words with corpus share > 1/1000) via the
    two-pass candidate scheme: pass 1's per-batch combiner
    (functions/text.py word_hh_partial) ships only locally-frequent words
    plus batch totals — the pigeonhole guarantee makes their union a
    superset of every global heavy hitter — pass 2 broadcast-filters the
    candidate set and exact-counts just those words.  Output counts are
    exact, unlike a Misra-Gries estimate, yet the exchange volume is
    O(phi_inv × batches), not the corpus vocabulary."""
    import pandas as pd
    from ray.data.aggregate import Sum

    PHI_INV = 1000

    p1 = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(
            lambda b: ftext.word_hh_partial(b, phi_inv=PHI_INV),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    p1 = _stable(p1, {"kind": "object", "word": "object", "n": "int64"})
    total = int(p1.loc[p1["kind"] == "t", "n"].sum())
    cand = set(p1.loc[p1["kind"] == "c", "word"])

    def count_cands(b: pa.Table) -> pa.Table:
        col = b["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = (
            pc.list_flatten(pc.split_pattern(pc.cast(col, pa.string()), " "))
            .to_pandas()
            .to_numpy(dtype=object)
        )
        s = pd.Series(words, dtype=object)
        vc = s[s.isin(cand)].value_counts()
        return pa.table(
            {
                "word": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "cnt": pa.array(vc.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    from anansi_ray.arrowds import coarse_agg

    out = coarse_agg(
        _read(sf_dir, "documents", ["text"]).map_batches(
            count_cands, batch_format="pyarrow"
        ),
        "word",
        {"cnt": ("sum", "cnt")},
    ).to_pandas()
    out = _stable(out, {"word": "object", "cnt": "int64"})
    out = out[out["cnt"] * PHI_INV > total].sort_values("word")
    out["cnt"] = out["cnt"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_HEAVY_HITTER_WORDS = """
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
t AS (SELECT count(*) AS n FROM w),
c AS (SELECT word, count(*) AS cnt FROM w GROUP BY 1)
SELECT word, cnt::BIGINT AS cnt FROM c, t
WHERE cnt * 1000 > n ORDER BY word
"""


def q_shingle_jaccard_join(sf_dir: str):
    """EXACT set-similarity threshold join (PPJoin-style prefix filtering):
    all document pairs whose 3-token shingle sets have Jaccard >= 0.6 --
    complete by construction, unlike minhash_near_dup (probabilistic LSH)
    and ngram_jaccard_pairs (verifies only LSH candidates).  Full pipeline
    and the prefix-filter lemma: functions/dedup.py shingle_jaccard_pairs."""
    out = fdedup.shingle_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        t_num=6,
        t_den=10,
        stamped=_shingle_stamped_ds(sf_dir),
    )
    if out is None:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    return out


SQL_SHINGLE_JACCARD_JOIN = r"""
WITH w AS (SELECT doc_id,
                  regexp_extract_all(lower(coalesce(text, '')), '\w+') AS ws
           FROM documents),
g AS (SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
i AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
      FROM g x JOIN g y ON x.sh = y.sh AND x.doc_id < y.doc_id
      GROUP BY 1, 2)
SELECT i.a, i.b,
       round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
FROM i JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b
WHERE inter * 10 >= 6 * (sa.n + sb.n - inter)
ORDER BY 1, 2
"""


def q_incremental_near_dup(sf_dir: str):
    """Incremental-ingest near-dup (the production shape: a NEW shard
    dedupes against the STANDING corpus without the corpus ever re-pairing
    with itself): docs with doc_id % 10 == 0 are the new shard; output one
    row per new doc that has a corpus near-dup (3-gram shingle Jaccard ≥
    0.6) with its match count and best score.

    Rides functions/dedup.py shingle_jaccard_pairs with ``new_pred`` —
    candidate enumeration drops every corpus×corpus (and new×new) pair at
    the prefix-bucket kernel, so per-ingest cost scales with the new
    shard's prefix volume, not the corpus pair count.  Exactness is
    inherited from the prefix-filter lemma (cross pairs are a subset of
    the complete join)."""
    out = fdedup.shingle_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        t_num=6,
        t_den=10,
        new_pred=lambda ids: ids % 10 == 0,
        stamped=_shingle_stamped_ds(sf_dir),
    )
    if out is None:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_matches": pa.array([], pa.int64()),
                "best_jaccard": pa.array([], pa.float64()),
            }
        )
    df = out.to_pandas()
    a, b = df["a"].to_numpy(), df["b"].to_numpy()
    df["doc_id"] = np.where(a % 10 == 0, a, b)
    g = (
        df.groupby("doc_id")
        .agg(n_matches=("jaccard", "size"), best_jaccard=("jaccard", "max"))
        .reset_index()
        .sort_values("doc_id")
    )
    g["n_matches"] = g["n_matches"].astype("int64")
    g["best_jaccard"] = g["best_jaccard"].round(6)
    return pa.Table.from_pandas(g.reset_index(drop=True), preserve_index=False)


SQL_INCREMENTAL_NEAR_DUP = r"""
WITH w AS (SELECT doc_id,
                  regexp_extract_all(lower(coalesce(text, '')), '\w+') AS ws
           FROM documents),
g AS (SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
i AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
      FROM g x JOIN g y ON x.sh = y.sh AND x.doc_id < y.doc_id
      GROUP BY 1, 2),
q AS (SELECT i.a, i.b,
             round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
      FROM i JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b
      WHERE inter * 10 >= 6 * (sa.n + sb.n - inter)
        AND ((i.a % 10 = 0) != (i.b % 10 = 0)))
SELECT (CASE WHEN a % 10 = 0 THEN a ELSE b END) AS doc_id,
       count(*)::BIGINT AS n_matches,
       round(max(jaccard), 6) AS best_jaccard
FROM q GROUP BY 1 ORDER BY 1
"""


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement (A-ES / Efraimidis-
    Spirakis with a hash in place of the random draw): pick the 100
    documents with the smallest rank = md5_uint(doc_id) / n_chars — longer
    docs draw proportionally smaller ranks, so inclusion probability scales
    with the weight, yet the draw is a pure function of the row (re-runs
    and the SQL twin reproduce it bit-for-bit; IEEE double division is
    deterministic on both engines).

    Scale shape: per-batch partial top-k combiner (only 100 rows leave any
    batch) → tiny driver-side final top-k — no sort, no shuffle of the
    corpus."""
    import hashlib

    K = 100

    def partial_topk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        w = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        # md5(decimal id), first 15 hex chars = top 60 bits of the first
        # big-endian word — one contiguous buffer, no per-row hex strings
        id_bytes = np.char.mod("%d", ids).astype("S").tolist()
        md5 = hashlib.md5
        buf = b"".join([md5(s).digest()[:8] for s in id_bytes])
        h = (np.frombuffer(buf, dtype=">u8") >> np.uint64(4)).astype(
            np.float64
        )
        rank = h / w
        keep = np.argsort(rank, kind="stable")[:K]
        keep = keep[np.argsort(ids[keep])]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "rank": pa.array(rank[keep], pa.float64()),
            }
        )

    parts = (
        _read(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()
    )
    parts = _stable(parts, {"doc_id": "int64", "rank": "float64"})
    out = parts.nsmallest(K, "rank").sort_values("doc_id")[["doc_id"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_WEIGHTED_SAMPLE = """
WITH r AS (SELECT doc_id,
                  ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT
                    / n_chars::DOUBLE AS rank
           FROM documents)
SELECT doc_id FROM r ORDER BY rank LIMIT 100
"""


def q_user_streaks(sf_dir: str):
    """Gaps-and-islands: longest consecutive-day activity streak per user.
    Distributed plan: per-batch distinct-(user, day) combiner BEFORE the
    exchange (the shuffle carries at most one row per user-day per batch,
    never the event stream), ONE user-hash exchange, then a per-partition
    vectorized island kernel — lexsort, cross-batch re-dedup, run boundary
    where the user changes or the day gap exceeds 1, run lengths by
    boundary diffs, per-user max/sum via ``reduceat``.  No per-row or
    per-group Python, no global sort."""
    P = 32
    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        d = ts_us(b["ts"]).to_numpy(zero_copy_only=False) // DAY_US
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        u, d = u[keep], d[keep]
        return pa.table(
            {
                "part": pa.array((u % P).astype(np.int32), pa.int32()),
                "user_id": pa.array(u, pa.int64()),
                "dayno": pa.array(d, pa.int64()),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "max_streak": pa.array([], pa.int64()),
            "n_days": pa.array([], pa.int64()),
        }
    )

    def island_kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        d = group["dayno"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        u, d = u[keep], d[keep]
        # island starts: new user OR day gap != 1
        starts = np.flatnonzero(
            np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)]
        )
        lens = np.diff(np.r_[starts, len(u)])
        ru = u[starts]  # user of each run (runs are user-contiguous)
        ustarts = np.flatnonzero(np.r_[True, ru[1:] != ru[:-1]])
        return pa.table(
            {
                "user_id": pa.array(ru[ustarts], pa.int64()),
                "max_streak": pa.array(
                    np.maximum.reduceat(lens, ustarts).astype(np.int64), pa.int64()
                ),
                "n_days": pa.array(
                    np.add.reduceat(lens, ustarts).astype(np.int64), pa.int64()
                ),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    out = _stable(
        drop_empty_blocks(
            _read(sf_dir, "events", ["user_id", "ts"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(island_kernel, batch_format="pyarrow")
            .materialize()
        ).to_pandas(),
        {"user_id": "int64", "max_streak": "int64", "n_days": "int64"},
    ).sort_values("user_id")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_USER_STREAKS = """
WITH d AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS dayno
           FROM events),
r AS (SELECT user_id, dayno,
             row_number() OVER (PARTITION BY user_id ORDER BY dayno) AS rn
      FROM d),
s AS (SELECT user_id, count(*) AS len FROM r GROUP BY user_id, dayno - rn)
SELECT user_id, max(len)::BIGINT AS max_streak, sum(len)::BIGINT AS n_days
FROM s GROUP BY 1 ORDER BY 1
"""


def _cents_hist(sf_dir: str, group_col: str | None):
    """Shared histogram-partial pass for the order-price robust statistics:
    per batch, reduce (group, cents) to counts with the composite-key
    ``np.unique`` pattern of ``q_events_quantiles``, then ONE tiny
    ``groupby.sum`` exchange.  The merged histogram is bounded by the
    price DOMAIN (distinct cent values), not the row count — at 100 TB the
    exchange still moves |domain| rows, so the driver-side quantile finish
    stays small."""
    from ray.data.aggregate import Sum

    cols = ["o_totalprice"] + ([group_col] if group_col else [])

    def partial(b: pa.Table) -> pa.Table:
        cents = (
            pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        if group_col is None:
            key, cnt = np.unique(cents, return_counts=True)
            return pa.table(
                {
                    "cents": pa.array(key, pa.int64()),
                    "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )
        g = b[group_col].to_numpy(zero_copy_only=False)
        gvals, ginv = np.unique(g, return_inverse=True)
        cmin = cents.min() if len(cents) else 0
        span = int(cents.max() - cmin) + 1 if len(cents) else 1
        key, inv = np.unique(ginv * span + (cents - cmin), return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        first = np.full(len(key), np.iinfo(np.int64).max)
        np.minimum.at(first, inv, np.arange(len(inv)))
        return pa.table(
            {
                group_col: pa.array(g[first], pa.string()),
                "cents": pa.array(cents[first], pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    from anansi_ray.arrowds import coarse_agg

    keys = [group_col, "cents"] if group_col else "cents"
    out = coarse_agg(
        _read(sf_dir, "orders", cols).map_batches(
            partial, batch_format="pyarrow"
        ),
        keys,
        {"cnt": ("sum", "cnt")},
    ).to_pandas()
    schema = {"cents": "int64", "cnt": "int64"}
    if group_col:
        schema = {group_col: "object", **schema}
    return _stable(out, schema)


def _inv_cdf(values: np.ndarray, counts: np.ndarray, q: float) -> int:
    """Lower inverse CDF over a (sorted-value, count) histogram — the
    ``cum >= ceil(q * tot)`` convention shared with the SQL twins."""
    cum = counts.cumsum()
    target = int(np.ceil(q * int(cum[-1])))
    return int(values[np.searchsorted(cum, target, side="left")])


def q_orders_mad_outliers(sf_dir: str):
    """Robust per-group outlier detection via MEDIAN ABSOLUTE DEVIATION —
    a two-level holistic aggregate (median of |x - median|) that cannot
    pre-reduce.  The honest distributed plan is ONE domain-bounded
    histogram exchange (see ``_cents_hist``); median, MAD and the
    ``|x - med| > 3*MAD`` outlier count all read off the merged histogram
    driver-side with weighted inverse-CDF — the raw rows never move
    twice."""
    hist = _cents_hist(sf_dir, "o_orderpriority")
    rows = []
    for pri, grp in hist.groupby("o_orderpriority"):
        grp = grp.sort_values("cents")
        v = grp["cents"].to_numpy()
        c = grp["cnt"].to_numpy()
        med = _inv_cdf(v, c, 0.5)
        dev = np.abs(v - med)
        order = np.argsort(dev, kind="stable")
        dv, dc = dev[order], c[order]
        # merge equal deviations (two cent values can share |x - med|)
        starts = np.flatnonzero(np.r_[True, dv[1:] != dv[:-1]])
        dvu = dv[starts]
        dcu = np.add.reduceat(dc, starts)
        mad = _inv_cdf(dvu, dcu, 0.5)
        n = int(c.sum())
        n_out = int(c[dev > 3 * mad].sum())
        rows.append((pri, n, med, mad, n_out))
    rows.sort()
    return pa.table(
        {
            "o_orderpriority": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "median_cents": pa.array([r[2] for r in rows], pa.int64()),
            "mad_cents": pa.array([r[3] for r in rows], pa.int64()),
            "n_outliers": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


SQL_ORDERS_MAD_OUTLIERS = """
WITH c AS (SELECT o_orderpriority AS pri,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
h AS (SELECT pri, cents, count(*) AS cnt FROM c GROUP BY 1, 2),
w AS (SELECT pri, cents, cnt,
             sum(cnt) OVER (PARTITION BY pri ORDER BY cents) AS cum,
             sum(cnt) OVER (PARTITION BY pri) AS tot
      FROM h),
m AS (SELECT pri, min(CASE WHEN cum >= ceil(0.5 * tot) THEN cents END) AS med
      FROM w GROUP BY 1),
d AS (SELECT h.pri, abs(h.cents - m.med) AS dev, h.cnt, m.med
      FROM h JOIN m USING (pri)),
dh AS (SELECT pri, dev, sum(cnt) AS cnt FROM d GROUP BY 1, 2),
dw AS (SELECT pri, dev,
              sum(cnt) OVER (PARTITION BY pri ORDER BY dev) AS cum,
              sum(cnt) OVER (PARTITION BY pri) AS tot
       FROM dh),
md AS (SELECT pri, min(CASE WHEN cum >= ceil(0.5 * tot) THEN dev END) AS mad
       FROM dw GROUP BY 1)
SELECT d.pri AS o_orderpriority, sum(d.cnt)::BIGINT AS n,
       max(d.med)::BIGINT AS median_cents, max(md.mad)::BIGINT AS mad_cents,
       sum(CASE WHEN d.dev > 3 * md.mad THEN d.cnt ELSE 0 END)::BIGINT
         AS n_outliers
FROM d JOIN md USING (pri) GROUP BY 1 ORDER BY 1
"""


def q_orders_winsorized(sf_dir: str):
    """Winsorized (p01/p99-clipped) per-status price aggregates: pass 1 is
    the domain-bounded global cents histogram (``_cents_hist``) from which
    the driver reads the two clip points; pass 2 re-streams orders with
    the clip broadcast in the closure, clips with ``np.clip`` and
    pre-reduces per-status (n, sum, min, max) partials per batch, so the
    final exchange is |statuses| × |batches| rows.  Two streaming passes,
    zero materialization."""
    from ray.data.aggregate import Max, Min, Sum

    hist = _cents_hist(sf_dir, None).sort_values("cents")
    v = hist["cents"].to_numpy()
    c = hist["cnt"].to_numpy()
    # empty orders: no clip points and the per-status groupby below
    # produces 0 rows either way — any clip bound works
    lo, hi = (
        (_inv_cdf(v, c, 0.01), _inv_cdf(v, c, 0.99)) if len(v) else (0, 0)
    )

    def partial(b: pa.Table) -> pa.Table:
        cents = (
            pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        wc = np.clip(cents, lo, hi)
        s = b["o_orderstatus"].to_numpy(zero_copy_only=False)
        svals, sinv = np.unique(s, return_inverse=True)
        n = np.bincount(sinv).astype(np.int64)
        tot = np.bincount(sinv, weights=wc).astype(np.int64)
        mn = np.full(len(svals), np.iinfo(np.int64).max)
        mx = np.full(len(svals), np.iinfo(np.int64).min)
        np.minimum.at(mn, sinv, wc)
        np.maximum.at(mx, sinv, wc)
        return pa.table(
            {
                "o_orderstatus": pa.array(svals, pa.string()),
                "n": pa.array(n, pa.int64()),
                "sum_wcents": pa.array(tot, pa.int64()),
                "min_wcents": pa.array(mn, pa.int64()),
                "max_wcents": pa.array(mx, pa.int64()),
            }
        )

    out = (
        _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_wcents", alias_name="sum_wcents"),
            Min("min_wcents", alias_name="min_wcents"),
            Max("max_wcents", alias_name="max_wcents"),
        )
        .to_pandas()
    )
    out = _stable(
        out,
        {
            "o_orderstatus": "object",
            "n": "int64",
            "sum_wcents": "int64",
            "min_wcents": "int64",
            "max_wcents": "int64",
        },
    ).sort_values("o_orderstatus")
    for col in ("n", "sum_wcents", "min_wcents", "max_wcents"):
        out[col] = out[col].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_ORDERS_WINSORIZED = """
WITH c AS (SELECT o_orderstatus,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
h AS (SELECT cents, count(*) AS cnt FROM c GROUP BY 1),
w AS (SELECT cents, sum(cnt) OVER (ORDER BY cents) AS cum,
             sum(cnt) OVER () AS tot
      FROM h),
q AS (SELECT min(CASE WHEN cum >= ceil(0.01 * tot) THEN cents END) AS lo,
             min(CASE WHEN cum >= ceil(0.99 * tot) THEN cents END) AS hi
      FROM w),
x AS (SELECT o_orderstatus, least(greatest(cents, lo), hi) AS wc FROM c, q)
SELECT o_orderstatus, count(*)::BIGINT AS n, sum(wc)::BIGINT AS sum_wcents,
       min(wc)::BIGINT AS min_wcents, max(wc)::BIGINT AS max_wcents
FROM x GROUP BY 1 ORDER BY 1
"""


def _doc_token_pairs(b: pa.Table):
    """Vectorized distinct-(doc, token) extraction for a batch: the same
    ``\\w+`` word model as ``token_df_partial`` (split on ``\\W+``, drop
    empties), deduped per doc."""
    import pandas as pd

    ids = b["doc_id"].to_numpy(zero_copy_only=False)
    col = pc.fill_null(b["text"], "")
    toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\W+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    doc = np.repeat(ids, lens)
    s = flat.to_pandas()
    mask = (s.str.len() > 0).to_numpy()
    return pd.DataFrame({"doc_id": doc[mask], "token": s[mask]}).drop_duplicates()


def q_token_novelty(sf_dir: str):
    """Per-document token novelty: how many of a doc's distinct tokens
    make their CORPUS-FIRST appearance in that doc (first = min doc_id).
    Two streaming passes, no join shuffle: (a) per-batch per-doc distinct
    counts — docs never split across batches, so this needs NO exchange;
    (b) per-batch (token, min-doc) combiner → ``groupby(token).min`` — the
    exchange carries batch vocabularies — then the vocab-sized result
    re-aggregates as novel-counts per first-doc.  The two small per-doc
    tables meet in a driver-side left join (|docs| rows, not |tokens|)."""
    from ray.data.aggregate import Count, Min

    def distinct_partial(b: pa.Table) -> pa.Table:
        df = _doc_token_pairs(b)
        g = df.groupby("doc_id", sort=False).size()
        return pa.table(
            {
                "doc_id": pa.array(g.index.to_numpy(np.int64), pa.int64()),
                "n_distinct": pa.array(g.to_numpy(np.int64), pa.int64()),
            }
        )

    def first_partial(b: pa.Table) -> pa.Table:
        df = _doc_token_pairs(b)
        g = df.groupby("token", sort=False)["doc_id"].min()
        return pa.table(
            {
                "token": pa.array(g.index.to_numpy(object), pa.string()),
                "doc_id": pa.array(g.to_numpy(np.int64), pa.int64()),
            }
        )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    nd = _stable(
        docs.map_batches(distinct_partial, batch_format="pyarrow").to_pandas(),
        {"doc_id": "int64", "n_distinct": "int64"},
    ).set_index("doc_id")["n_distinct"]
    from anansi_ray.arrowds import coarse_agg

    firsts = _stable(
        coarse_agg(
            coarse_agg(
                docs.map_batches(first_partial, batch_format="pyarrow"),
                "token",
                {"doc_id": ("min", "doc_id")},
            ),
            "doc_id",
            {"n_novel": ("count", "doc_id")},
        ).to_pandas(),
        {"doc_id": "int64", "n_novel": "int64"},
    ).set_index("doc_id")["n_novel"]
    base = (
        _read(sf_dir, "documents", ["doc_id"]).to_pandas().sort_values("doc_id")
    )
    base["n_distinct"] = nd.reindex(base["doc_id"]).fillna(0).to_numpy(np.int64)
    base["n_novel"] = firsts.reindex(base["doc_id"]).fillna(0).to_numpy(np.int64)
    return pa.Table.from_pandas(base.reset_index(drop=True), preserve_index=False)


SQL_TOKEN_NOVELTY = r"""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\w+')) AS token
  FROM documents),
f AS (SELECT token, min(doc_id) AS first_doc FROM tok GROUP BY 1),
nv AS (SELECT first_doc AS doc_id, count(*) AS n_novel FROM f GROUP BY 1),
nd AS (SELECT doc_id, count(*) AS n_distinct FROM tok GROUP BY 1)
SELECT d.doc_id, coalesce(nd.n_distinct, 0)::BIGINT AS n_distinct,
       coalesce(nv.n_novel, 0)::BIGINT AS n_novel
FROM documents d LEFT JOIN nd USING (doc_id) LEFT JOIN nv USING (doc_id)
ORDER BY d.doc_id
"""


def q_part_copurchase(sf_dir: str):
    """Market-basket pair mining: the top-100 part pairs co-occurring in
    the same order.  The naive self-join explodes |order|² rows through
    the shuffle; here each batch first dedupes (order, part), ONE
    orderkey-hash exchange co-locates each basket, and a per-partition
    kernel expands pairs VECTORIZED (repeat/searchsorted index algebra —
    no Python loop over baskets) and pre-reduces them to (p1, p2, n)
    partials, so the final pair exchange carries combined counts, never
    raw pairs.  Baskets are small (avg ~4 lineitems) so the in-partition
    expansion is O(rows × avg_basket).  The pair key is PACKED into one
    int64 so the count exchange shuffles a single numeric column, and the
    top-100 is a per-batch partial top-k — the driver never sees the pair
    table, only #batches × 100 candidates."""
    P = 32

    def dedup_partial(b: pa.Table) -> pa.Table:
        o = b["l_orderkey"].to_numpy(zero_copy_only=False)
        p = b["l_partkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        keep = np.r_[True, (o[1:] != o[:-1]) | (p[1:] != p[:-1])]
        o, p = o[keep], p[keep]
        return pa.table(
            {
                "part": pa.array((o % P).astype(np.int32), pa.int32()),
                "l_orderkey": pa.array(o, pa.int64()),
                "l_partkey": pa.array(p, pa.int64()),
            }
        )

    empty = pa.table(
        {"pk": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )
    pair_empty = pa.table(
        {
            "pkpart": pa.array([], pa.int32()),
            "pk": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def pair_kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pair_empty
        o = group["l_orderkey"].to_numpy(zero_copy_only=False)
        p = group["l_partkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        keep = np.r_[True, (o[1:] != o[:-1]) | (p[1:] != p[:-1])]
        o, p = o[keep], p[keep]
        starts = np.flatnonzero(np.r_[True, o[1:] != o[:-1]])
        counts = np.diff(np.r_[starts, len(o)])
        # pair expansion: element i pairs with the rep[i] elements after it
        # in its own basket (parts sorted, so p1 < p2 holds by construction)
        local = np.arange(len(p)) - np.repeat(starts, counts)
        rep = np.repeat(counts, counts) - local - 1
        total = int(rep.sum())
        if total == 0:
            return pair_empty
        csum = np.concatenate(([0], np.cumsum(rep)))
        pos = np.arange(total)
        src = np.searchsorted(csum, pos, side="right") - 1
        a = p[src]
        bb = p[src + (pos - csum[src]) + 1]
        # single packed int64 pair key (partkey < 2^31 by TPC-H construction)
        # so the pair exchange shuffles ONE numeric column, and (n desc, pk
        # asc) ordering equals (n desc, p1, p2) for the top-k
        pk = a * np.int64(1 << 31) + bb
        key, inv = np.unique(pk, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "pkpart": pa.array((key % P).astype(np.int32), pa.int32()),
                "pk": pa.array(key, pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    def combine_topk(g: pa.Table) -> pa.Table:
        # per-pk-partition combine + partial top-100: each pk lives in
        # exactly one partition, so the global top-100 is contained in the
        # union of these partials — at most 100 rows leave any partition.
        # A coarse 32-way exchange beats groupby(pk): at corpus scale the
        # pair keys are nearly all distinct, so a key-sorted aggregate
        # would full-sort the pair table to merge almost nothing.
        if g.num_rows == 0:
            return empty
        pk = g["pk"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        key, inv = np.unique(pk, return_inverse=True)
        tot = np.bincount(inv, weights=n).astype(np.int64)
        order = np.lexsort((key, -tot))[:100]
        return pa.table(
            {
                "pk": pa.array(key[order], pa.int64()),
                "n": pa.array(tot[order], pa.int64()),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    parts = (
        drop_empty_blocks(
            _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
            .map_batches(dedup_partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(pair_kernel, batch_format="pyarrow")
            .materialize()
        )
        .groupby("pkpart")
        .map_groups(combine_topk, batch_format="pyarrow")
        .to_pandas()
    )
    parts = _stable(parts, {"pk": "int64", "n": "int64"})
    n = parts["n"].to_numpy()
    pk = parts["pk"].to_numpy()
    order = np.lexsort((pk, -n))[:100]
    pk, n = pk[order], n[order]
    return pa.table(
        {
            "p1": pa.array(pk >> 31, pa.int64()),
            "p2": pa.array(pk & ((1 << 31) - 1), pa.int64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        }
    )


SQL_PART_COPURCHASE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*)::BIGINT AS n
FROM li a JOIN li b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 ORDER BY n DESC, p1, p2 LIMIT 100
"""


def _timeline_exchange(sf_dir: str, cols: list[str], kernel, empty: pa.Table):
    """Shared skeleton for order-dependent per-user timeline operators
    (next-event adjacency, time-weighted gaps): project events to the
    needed columns at the READ, tag ``user_id % P``, ONE co-partitioning
    exchange, then a per-partition vectorized kernel.  Adjacency needs the
    user's whole timeline in one place, so — unlike the algebraic
    aggregates — there is no per-batch combiner; the exchange carries the
    projected rows exactly once."""
    P = 32

    def tag(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "part", pa.array((u % P).astype(np.int32), pa.int32())
        )

    def guarded(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        return kernel(group)

    from anansi_ray.arrowds import drop_empty_blocks

    return drop_empty_blocks(
        _read(sf_dir, "events", cols)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(guarded, batch_format="pyarrow")
        .materialize()
    )


def q_event_transitions(sf_dir: str):
    """First-order Markov transition counts over per-user timelines: for
    every consecutive event pair within a user's (ts, event_id)-ordered
    history, count (from_type → to_type).  Per-partition kernel: lexsort,
    same-user adjacency mask, composite-code ``np.unique`` pair reduction —
    each partition forwards ≤ |types|² rows, so the final exchange is a
    catalog-sized groupby regardless of corpus size."""
    from ray.data.aggregate import Sum

    empty = pa.table(
        {
            "from_type": pa.array([], pa.string()),
            "to_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def kernel(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy(zero_copy_only=False)
        t = ts_us(group["ts"]).to_numpy(zero_copy_only=False)
        e = group["event_id"].to_numpy(zero_copy_only=False)
        et = group["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, et = u[order], et[order]
        types, code = np.unique(et, return_inverse=True)
        same = u[1:] == u[:-1]
        a, b = code[:-1][same], code[1:][same]
        key, cnt = np.unique(a * len(types) + b, return_counts=True)
        return pa.table(
            {
                "from_type": pa.array(types[key // len(types)], pa.string()),
                "to_type": pa.array(types[key % len(types)], pa.string()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    out = (
        _timeline_exchange(
            sf_dir, ["user_id", "ts", "event_id", "event_type"], kernel, empty
        )
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out = _stable(
        out, {"from_type": "object", "to_type": "object", "n": "int64"}
    ).sort_values(["from_type", "to_type"])
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_EVENT_TRANSITIONS = """
WITH s AS (SELECT user_id, event_type,
                  lead(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
           FROM events)
SELECT event_type AS from_type, nxt AS to_type, count(*)::BIGINT AS n
FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_sequence_entropy_rate(sf_dir: str):
    """Markov entropy rate of the event-type process, H = −Σᵢ πᵢ Σⱼ Pᵢⱼ
    ln Pᵢⱼ with π the empirical from-state distribution — how predictable
    the next event is given the current one (the information-theoretic
    twin of event_transitions, whose distributed counts it reuses).
    Also reports H₀ = ln|types| and the predictability ratio 1 − H/H₀.
    The fold runs on the catalog-sized transition table; full SQL twin."""
    import math

    trans = q_event_transitions(sf_dir).to_pandas()
    spec = {
        "n_transitions": pa.int64(),
        "n_states": pa.int64(),
        "entropy_rate": pa.float64(),
        "max_entropy": pa.float64(),
        "predictability": pa.float64(),
    }
    if len(trans) == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    tot = int(trans["n"].sum())
    h = 0.0
    for _, grp in trans.groupby("from_type", sort=True):
        row_n = grp["n"].to_numpy(dtype=np.float64)
        row_tot = row_n.sum()
        pi = row_tot / tot
        p = row_n / row_tot
        h += pi * float(-(p * np.log(p)).sum())
    states = sorted(
        set(trans["from_type"]) | set(trans["to_type"])
    )
    h0 = math.log(len(states)) if len(states) > 1 else 0.0
    pred = 1.0 - h / h0 if h0 > 0 else 0.0
    return pa.table(
        {
            "n_transitions": pa.array([tot], pa.int64()),
            "n_states": pa.array([len(states)], pa.int64()),
            "entropy_rate": pa.array([round(h, 6)], pa.float64()),
            "max_entropy": pa.array([round(h0, 6)], pa.float64()),
            "predictability": pa.array([round(pred, 6)], pa.float64()),
        }
    )


SQL_SEQUENCE_ENTROPY_RATE = """
WITH s AS (SELECT user_id, event_type,
                  lead(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
           FROM events),
t AS (SELECT event_type AS f, nxt AS g, count(*)::BIGINT AS n
      FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT sum(n)::DOUBLE AS tt FROM t),
rows_ AS (SELECT f, sum(n)::DOUBLE AS rn FROM t GROUP BY f),
h AS (
  SELECT sum((rows_.rn / tot.tt)
             * (-(t.n / rows_.rn) * ln(t.n / rows_.rn))) AS hr
  FROM t JOIN rows_ USING (f) CROSS JOIN tot),
st AS (
  SELECT count(DISTINCT x)::BIGINT AS k
  FROM (SELECT f AS x FROM t UNION SELECT g FROM t))
SELECT (SELECT tt FROM tot)::BIGINT AS n_transitions,
       st.k AS n_states,
       round((SELECT hr FROM h), 6) AS entropy_rate,
       round(CASE WHEN st.k > 1 THEN ln(st.k::DOUBLE) ELSE 0 END, 6)
         AS max_entropy,
       round(CASE WHEN st.k > 1
               THEN 1.0 - (SELECT hr FROM h) / ln(st.k::DOUBLE)
               ELSE 0 END, 6) AS predictability
FROM st
WHERE (SELECT tt FROM tot) > 0
"""


def q_user_twap(sf_dir: str):
    """Time-weighted value aggregate per user (TWAP building block): each
    event's value is weighted by the whole seconds until the user's next
    event; integer fixed-point (value → floor(v·10⁴)) so the weighted sum
    is summation-order independent and the SQL twin matches bit-for-bit.
    Same one-exchange timeline skeleton as ``event_transitions``; the
    kernel finishes per-user with ``reduceat`` — no per-group Python."""
    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_gaps": pa.array([], pa.int64()),
            "sum_gap_s": pa.array([], pa.int64()),
            "sum_wv": pa.array([], pa.int64()),
        }
    )

    def kernel(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy(zero_copy_only=False)
        t = ts_us(group["ts"]).to_numpy(zero_copy_only=False)
        e = group["event_id"].to_numpy(zero_copy_only=False)
        v = group["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, t, v = u[order], t[order], v[order]
        vfp = np.floor(v * 10000.0).astype(np.int64)
        same = u[1:] == u[:-1]
        gap_s = (t[1:] - t[:-1]) // 1_000_000
        uu = u[:-1][same]
        g = gap_s[same]
        wv = vfp[:-1][same] * g
        starts = np.flatnonzero(np.r_[True, uu[1:] != uu[:-1]])
        if len(uu) == 0:
            return empty
        return pa.table(
            {
                "user_id": pa.array(uu[starts], pa.int64()),
                "n_gaps": pa.array(
                    np.diff(np.r_[starts, len(uu)]).astype(np.int64), pa.int64()
                ),
                "sum_gap_s": pa.array(np.add.reduceat(g, starts), pa.int64()),
                "sum_wv": pa.array(np.add.reduceat(wv, starts), pa.int64()),
            }
        )

    out = _stable(
        _timeline_exchange(
            sf_dir, ["user_id", "ts", "event_id", "value"], kernel, empty
        ).to_pandas(),
        {
            "user_id": "int64",
            "n_gaps": "int64",
            "sum_gap_s": "int64",
            "sum_wv": "int64",
        },
    ).sort_values("user_id")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_USER_TWAP = """
WITH s AS (SELECT user_id, floor(value * 10000)::BIGINT AS vfp,
                  epoch_us(ts) AS t,
                  lead(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) AS nt
           FROM events)
SELECT user_id, count(*)::BIGINT AS n_gaps,
       sum((nt - t) // 1000000)::BIGINT AS sum_gap_s,
       sum(vfp * ((nt - t) // 1000000))::BIGINT AS sum_wv
FROM s WHERE nt IS NOT NULL GROUP BY 1 ORDER BY 1
"""


def q_embedding_stats(sf_dir: str):
    """Per-dimension corpus moments of the embedding matrix (the feature-
    normalization building block): each batch reduces its vectors to one
    (Σx, Σx²) pair per dimension — a dim×2 partial, so the driver combine
    sees #batches × dim rows, never a vector.  Float sums are rounded on
    both sides to absorb summation-order differences."""
    def partial(b: pa.Table) -> pa.Table:
        m = np.vstack(b["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        return pa.table(
            {
                "dim": pa.array(np.arange(1, m.shape[1] + 1), pa.int64()),
                "n": pa.array(
                    np.full(m.shape[1], m.shape[0], dtype=np.int64), pa.int64()
                ),
                "s1": pa.array(m.sum(axis=0), pa.float64()),
                "s2": pa.array((m * m).sum(axis=0), pa.float64()),
            }
        )

    parts = (
        _read(sf_dir, "embeddings", ["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    parts = _stable(
        parts, {"dim": "int64", "n": "int64", "s1": "float64", "s2": "float64"}
    )
    out = (
        parts.groupby("dim", sort=True)
        .agg(n=("n", "sum"), sum_v=("s1", "sum"), sum_v2=("s2", "sum"))
        .reset_index()
    )
    out["sum_v"] = out["sum_v"].round(4)
    out["sum_v2"] = out["sum_v2"].round(4)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_EMBEDDING_STATS = """
WITH e AS (SELECT unnest(embedding)::DOUBLE AS v,
                  generate_subscripts(embedding, 1)::BIGINT AS dim
           FROM embeddings)
SELECT dim, count(*)::BIGINT AS n,
       round(sum(v), 4) AS sum_v, round(sum(v * v), 4) AS sum_v2
FROM e GROUP BY 1 ORDER BY 1
"""


def q_type_hour_mi(sf_dir: str):
    """Mutual information between event type and hour-of-day (the feature-
    selection / drift-profiling primitive): ONE catalog-sized histogram
    exchange of (type, hour) counts — per-batch composite-key combiner
    first — then the |types|×24 joint table yields marginals and
    MI = Σ p(x,y)·ln(p(x,y)·N / (n(x)·m(y))) driver-side.  The integer
    histogram is exact; only the final log-sum is float, rounded on both
    sides."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        hr = (
            ts_us(b["ts"]).to_numpy(zero_copy_only=False)
            // 3_600_000_000
            % 24
        )
        types, tinv = np.unique(et, return_inverse=True)
        key, inv = np.unique(tinv * 24 + hr, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "event_type": pa.array(types[key // 24], pa.string()),
                "hour": pa.array((key % 24).astype(np.int64), pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    hist = (
        _read(sf_dir, "events", ["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    if len(hist) == 0:
        # SQL aggregate-over-empty: one all-NULL row
        return pa.table(
            {
                "n": pa.array([None], pa.int64()),
                "mi_nats": pa.array([None], pa.float64()),
            }
        )
    joint = hist.pivot_table(
        index="event_type", columns="hour", values="cnt", fill_value=0
    ).to_numpy(dtype=np.float64)
    n = joint.sum()
    px = joint.sum(axis=1, keepdims=True)
    py = joint.sum(axis=0, keepdims=True)
    nz = joint > 0
    mi = float((joint[nz] / n * np.log(joint[nz] * n / (px @ py)[nz])).sum())
    return pa.table(
        {
            "n": pa.array([int(n)], pa.int64()),
            "mi_nats": pa.array([round(mi, 6)], pa.float64()),
        }
    )


SQL_TYPE_HOUR_MI = """
WITH c AS (SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour,
                  count(*)::DOUBLE AS cnt
           FROM events GROUP BY 1, 2),
t AS (SELECT sum(cnt) AS n FROM c),
x AS (SELECT event_type, sum(cnt) AS nx FROM c GROUP BY 1),
y AS (SELECT hour, sum(cnt) AS ny FROM c GROUP BY 1)
SELECT max(t.n)::BIGINT AS n,
       round(sum(c.cnt / t.n * ln(c.cnt * t.n / (x.nx * y.ny))), 6) AS mi_nats
FROM c JOIN x USING (event_type) JOIN y USING (hour) CROSS JOIN t
"""


_PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def q_events_profile(sf_dir: str):
    """Columnar table profiling (the data-quality audit primitive): per
    column, row count, null count and EXACT distinct count.  Each batch
    melts to distinct (col, value-token) pairs — ``np.unique`` per column
    first, so only the batch's per-column vocabulary is stringified and
    shuffled, which collapses low-cardinality columns to a handful of rows
    — then ONE coarse 32-way hash(col,val) exchange and a per-partition
    distinct-count kernel.  Each (col, val) pair lands in exactly one
    partition, so per-partition distinct counts SUM to the global count —
    no key-sorted aggregate ever sorts the (mostly-distinct) value space.
    Distinctness (not the string repr) is what the count needs, so the
    injective per-type tokenization (epoch int for timestamps, repr for
    floats) is safe."""
    import pandas as pd

    from ray.data.aggregate import Sum

    P = 32

    def melt(b: pa.Table) -> pa.Table:
        cols, vals = [], []
        for name in _PROFILE_COLS:
            arr = b[name]
            if pa.types.is_timestamp(arr.type):
                np_vals = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
            else:
                np_vals = arr.to_numpy(zero_copy_only=False)
            u = np.unique(np_vals[~pa.compute.is_null(arr).to_numpy(
                zero_copy_only=False)]) if arr.null_count else np.unique(np_vals)
            cols.append(np.full(len(u), name, dtype=object))
            vals.append(u.astype(str).astype(object))
        col = np.concatenate(cols)
        val = np.concatenate(vals)
        h = pd.util.hash_array(np.char.add(col.astype(str), val.astype(str)))
        return pa.table(
            {
                "part": pa.array((h % P).astype(np.int32), pa.int32()),
                "col": pa.array(col, pa.string()),
                "val": pa.array(val, pa.string()),
            }
        )

    nd_empty = pa.table(
        {"col": pa.array([], pa.string()), "nd": pa.array([], pa.int64())}
    )

    def distinct_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return nd_empty
        df = g.select(["col", "val"]).to_pandas().drop_duplicates()
        cnt = df.groupby("col", sort=False).size()
        return pa.table(
            {
                "col": pa.array(cnt.index.to_numpy(object), pa.string()),
                "nd": pa.array(cnt.to_numpy(np.int64), pa.int64()),
            }
        )

    def null_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "col": pa.array(_PROFILE_COLS, pa.string()),
                "n": pa.array([b.num_rows] * len(_PROFILE_COLS), pa.int64()),
                "n_null": pa.array(
                    [b[c].null_count for c in _PROFILE_COLS], pa.int64()
                ),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    ev = _read(sf_dir, "events", _PROFILE_COLS)
    nd = (
        drop_empty_blocks(
            ev.map_batches(melt, batch_format="pyarrow")
            .groupby("part")
            .map_groups(distinct_kernel, batch_format="pyarrow")
            .materialize()
        )
        .groupby("col")
        .aggregate(Sum("nd", alias_name="n_distinct"))
        .to_pandas()
    )
    nd = _stable(nd, {"col": "object", "n_distinct": "int64"}).set_index(
        "col"
    )["n_distinct"]
    base = (
        ev.map_batches(null_partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(Sum("n", alias_name="n"), Sum("n_null", alias_name="n_null"))
        .to_pandas()
    )
    base = _stable(base, {"col": "object", "n": "int64", "n_null": "int64"})
    if len(base) == 0:
        # SQL twin on empty: each UNION branch still emits its (col, 0,
        # 0, 0) row — counts over an empty table are 0, not absent
        import pandas as pd

        base = pd.DataFrame(
            {"col": sorted(_PROFILE_COLS), "n": 0, "n_null": 0}
        )
    base = base.sort_values("col")
    base["n_distinct"] = (
        nd.reindex(base["col"]).fillna(0).to_numpy(np.int64)
    )
    for c in ("n", "n_null", "n_distinct"):
        base[c] = base[c].astype("int64")
    return pa.Table.from_pandas(base.reset_index(drop=True), preserve_index=False)


SQL_EVENTS_PROFILE = """
SELECT col, n, n_null, n_distinct FROM (
  SELECT 'event_id' AS col, count(*)::BIGINT AS n,
         (count(*) - count(event_id))::BIGINT AS n_null,
         count(DISTINCT event_id)::BIGINT AS n_distinct FROM events
  UNION ALL
  SELECT 'ts', count(*)::BIGINT, (count(*) - count(ts))::BIGINT,
         count(DISTINCT ts)::BIGINT FROM events
  UNION ALL
  SELECT 'user_id', count(*)::BIGINT, (count(*) - count(user_id))::BIGINT,
         count(DISTINCT user_id)::BIGINT FROM events
  UNION ALL
  SELECT 'event_type', count(*)::BIGINT, (count(*) - count(event_type))::BIGINT,
         count(DISTINCT event_type)::BIGINT FROM events
  UNION ALL
  SELECT 'value', count(*)::BIGINT, (count(*) - count(value))::BIGINT,
         count(DISTINCT value)::BIGINT FROM events
  UNION ALL
  SELECT 'props', count(*)::BIGINT, (count(*) - count(props))::BIGINT,
         count(DISTINCT props)::BIGINT FROM events
) ORDER BY col
"""


def q_user_state_intervals(sf_dir: str):
    """SCD-style run compaction: collapse each user's consecutive equal
    event_type observations into validity intervals (start, end, count) —
    run-length encoding of a timeline.  Same one-exchange skeleton as
    ``event_transitions``; the kernel finds run boundaries (user change OR
    type change) and finishes with three ``reduceat`` sweeps."""
    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "start_us": pa.array([], pa.int64()),
            "end_us": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
        }
    )

    def kernel(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy(zero_copy_only=False)
        t = ts_us(group["ts"]).to_numpy(zero_copy_only=False)
        e = group["event_id"].to_numpy(zero_copy_only=False)
        et = group["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, t, et = u[order], t[order], et[order]
        starts = np.flatnonzero(
            np.r_[True, (u[1:] != u[:-1]) | (et[1:] != et[:-1])]
        )
        ends = np.r_[starts[1:], len(u)] - 1
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "event_type": pa.array(et[starts], pa.string()),
                "start_us": pa.array(t[starts], pa.int64()),
                "end_us": pa.array(t[ends], pa.int64()),
                "n_events": pa.array(
                    (ends - starts + 1).astype(np.int64), pa.int64()
                ),
            }
        )

    out = _stable(
        _timeline_exchange(
            sf_dir, ["user_id", "ts", "event_id", "event_type"], kernel, empty
        ).to_pandas(),
        {
            "user_id": "int64",
            "event_type": "object",
            "start_us": "int64",
            "end_us": "int64",
            "n_events": "int64",
        },
    ).sort_values(["user_id", "start_us", "end_us", "event_type"])
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_USER_STATE_INTERVALS = """
WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
                  lag(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
b AS (SELECT user_id, event_type, t,
             sum(CASE WHEN prev IS DISTINCT FROM event_type THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY t, event_id) AS run_id
      FROM s)
SELECT user_id, event_type, min(t)::BIGINT AS start_us,
       max(t)::BIGINT AS end_us, count(*)::BIGINT AS n_events
FROM b GROUP BY user_id, event_type, run_id
ORDER BY user_id, start_us, end_us, event_type
"""


def q_daily_revenue_delta(sf_dir: str):
    """Aggregate-then-window: daily revenue with day-over-day delta.  The
    heavy stage is a per-batch (day, cents) combiner + catalog-sized
    groupby; the lag/diff runs driver-side on the |days| result — the
    window never touches the distributed plane because the aggregate
    already collapsed it."""
    from ray.data.aggregate import Sum

    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        d = (
            ts_us(b["o_orderdate"]).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        cents = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        days, inv = np.unique(d, return_inverse=True)
        rev = np.bincount(inv, weights=cents).astype(np.int64)
        return pa.table(
            {
                "dayno": pa.array(days, pa.int64()),
                "rev_cents": pa.array(rev, pa.int64()),
            }
        )

    out = (
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("dayno")
        .aggregate(Sum("rev_cents", alias_name="rev_cents"))
        .to_pandas()
    )
    out = _stable(out, {"dayno": "int64", "rev_cents": "int64"}).sort_values(
        "dayno"
    )
    out["rev_cents"] = out["rev_cents"].astype("int64")
    out["delta_cents"] = out["rev_cents"].diff()
    return pa.table(
        {
            "dayno": pa.array(out["dayno"].to_numpy(np.int64), pa.int64()),
            "rev_cents": pa.array(out["rev_cents"].to_numpy(np.int64), pa.int64()),
            "delta_cents": pa.array(
                [None if np.isnan(x) else int(x) for x in out["delta_cents"]],
                pa.int64(),
            ),
        }
    )


SQL_DAILY_REVENUE_DELTA = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS dayno,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
           FROM orders GROUP BY 1)
SELECT dayno::BIGINT AS dayno, rev::BIGINT AS rev_cents,
       (rev - lag(rev) OVER (ORDER BY dayno))::BIGINT AS delta_cents
FROM d ORDER BY dayno
"""


def q_orders_percentile_rank(sf_dir: str):
    """Windowed rank over HUGE low-cardinality partitions — the skew shape
    where the exchange strategy of ``events_user_rank`` (user-hash
    partitions) breaks down: 5 priorities × all orders would put the whole
    table in 5 groups.  Instead: the domain-bounded (priority, cents)
    histogram (``_cents_hist``, one tiny exchange) becomes a broadcast
    strictly-below cumulative per group (``ray.put`` ONCE, read zero-copy
    per task), and a second streaming pass ranks every row with one
    ``searchsorted`` — no per-group sort, no skewed shuffle.
    n_below = rank() − 1 (ties share a rank)."""
    import ray

    hist = _cents_hist(sf_dir, "o_orderpriority")
    lut = {}
    for pri, grp in hist.groupby("o_orderpriority"):
        grp = grp.sort_values("cents")
        v = grp["cents"].to_numpy()
        c = grp["cnt"].to_numpy()
        below = np.concatenate(([0], c.cumsum()[:-1]))
        lut[pri] = (v, below, int(c.sum()))
    lut_ref = ray.put(lut)

    def rank_batch(b: pa.Table) -> pa.Table:
        lt = ray.get(lut_ref)
        cents = (
            pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        pri = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        n_below = np.empty(len(pri), dtype=np.int64)
        group_n = np.empty(len(pri), dtype=np.int64)
        for p in np.unique(pri):
            m = pri == p
            v, below, tot = lt[p]
            n_below[m] = below[np.searchsorted(v, cents[m], side="left")]
            group_n[m] = tot
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "n_below": pa.array(n_below, pa.int64()),
                "group_n": pa.array(group_n, pa.int64()),
            }
        )

    out = _stable(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
        .map_batches(rank_batch, batch_format="pyarrow")
        .to_pandas(),
        {"o_orderkey": "int64", "n_below": "int64", "group_n": "int64"},
    ).sort_values("o_orderkey")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_ORDERS_PERCENTILE_RANK = """
WITH c AS (SELECT o_orderkey, o_orderpriority AS pri,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
SELECT o_orderkey,
       (rank() OVER (PARTITION BY pri ORDER BY cents) - 1)::BIGINT AS n_below,
       count(*) OVER (PARTITION BY pri)::BIGINT AS group_n
FROM c ORDER BY o_orderkey
"""


def q_funnel_latency(sf_dir: str):
    """Funnel conversion LATENCY (the metric behind events_funnel's
    counts): per user, seconds from the first view to the first purchase
    strictly after it; output = conversion count + p50/p90 gap.  Events
    are filter-pruned to the two stage types per batch, ONE user-hash
    exchange co-locates each user's stage rows, the kernel resolves both
    stages with two ``np.minimum.at`` sweeps and pre-reduces gaps to a
    (gap_s, cnt) histogram, and the driver reads the inverse CDF — the
    same ``cum >= ceil(q·tot)`` convention as events_quantiles."""
    P = 32

    def filter_tag(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        m = (et == "view") | (et == "purchase")
        u = b["user_id"].to_numpy(zero_copy_only=False)[m]
        return pa.table(
            {
                "part": pa.array((u % P).astype(np.int32), pa.int32()),
                "user_id": pa.array(u, pa.int64()),
                "t": pa.array(
                    ts_us(b["ts"]).to_numpy(zero_copy_only=False)[m],
                    pa.int64(),
                ),
                "is_view": pa.array(et[m] == "view", pa.bool_()),
            }
        )

    empty = pa.table(
        {"gap_s": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
    )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        isv = group["is_view"].to_numpy(zero_copy_only=False)
        users, code = np.unique(u, return_inverse=True)
        big = np.iinfo(np.int64).max
        t_view = np.full(len(users), big)
        np.minimum.at(t_view, code[isv], t[isv])
        buy = ~isv
        valid = buy & (t > t_view[code])
        t_buy = np.full(len(users), big)
        np.minimum.at(t_buy, code[valid], t[valid])
        conv = (t_view < big) & (t_buy < big)
        gaps = (t_buy[conv] - t_view[conv]) // 1_000_000
        if len(gaps) == 0:
            return empty
        gv, cnt = np.unique(gaps, return_counts=True)
        return pa.table(
            {
                "gap_s": pa.array(gv, pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    from anansi_ray.arrowds import drop_empty_blocks

    hist = (
        drop_empty_blocks(
            _read(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(filter_tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(kernel, batch_format="pyarrow")
            .materialize()
        )
        .groupby("gap_s")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    hist = _stable(hist, {"gap_s": "int64", "cnt": "int64"}).sort_values("gap_s")
    if len(hist) == 0:
        # zero conversions: the SQL twin's aggregate-over-empty yields one
        # all-NULL row, not an empty result — mirror it
        return pa.table(
            {
                "n_converted": pa.array([None], pa.int64()),
                "p50_gap_s": pa.array([None], pa.int64()),
                "p90_gap_s": pa.array([None], pa.int64()),
            }
        )
    v = hist["gap_s"].to_numpy()
    c = hist["cnt"].to_numpy()
    return pa.table(
        {
            "n_converted": pa.array([int(c.sum())], pa.int64()),
            "p50_gap_s": pa.array([_inv_cdf(v, c, 0.5)], pa.int64()),
            "p90_gap_s": pa.array([_inv_cdf(v, c, 0.9)], pa.int64()),
        }
    )


SQL_FUNNEL_LATENCY = """
WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t_view
           FROM events WHERE event_type = 'view' GROUP BY 1),
p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_buy
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.t_view
      GROUP BY 1),
g AS (SELECT (p.t_buy - v.t_view) // 1000000 AS gap_s
      FROM p JOIN v USING (user_id)),
w AS (SELECT gap_s, count(*) AS cnt FROM g GROUP BY 1),
c AS (SELECT gap_s, sum(cnt) OVER (ORDER BY gap_s) AS cum,
             sum(cnt) OVER () AS tot
      FROM w)
SELECT max(tot)::BIGINT AS n_converted,
       min(CASE WHEN cum >= ceil(0.5 * tot) THEN gap_s END)::BIGINT AS p50_gap_s,
       min(CASE WHEN cum >= ceil(0.9 * tot) THEN gap_s END)::BIGINT AS p90_gap_s
FROM c
"""


def q_customer_order_cadence(sf_dir: str):
    """Purchase-cadence mining (the RFM 'frequency rhythm' signal): per
    customer with ≥2 orders, the lower-median day gap between consecutive
    orders.  ONE custkey-hash exchange; the kernel derives the gap
    SEQUENCE (timeline adjacency) and then takes a per-customer holistic
    median of the derived sequence — two lexsorts, run boundaries,
    ``start + (n-1)//2`` pick — composing the timeline and grouped-median
    patterns without a second exchange."""
    P = 32
    DAY_US = 86_400_000_000

    def tag(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((k % P).astype(np.int32), pa.int32()),
                "o_custkey": b["o_custkey"],
                "dayno": pa.array(
                    ts_us(b["o_orderdate"]).to_numpy(zero_copy_only=False)
                    // DAY_US,
                    pa.int64(),
                ),
                "o_orderkey": b["o_orderkey"],
            }
        )

    empty = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "n_gaps": pa.array([], pa.int64()),
            "median_gap_days": pa.array([], pa.int64()),
        }
    )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        k = group["o_custkey"].to_numpy(zero_copy_only=False)
        d = group["dayno"].to_numpy(zero_copy_only=False)
        o = group["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, d, k))
        k, d = k[order], d[order]
        same = k[1:] == k[:-1]
        ku = k[:-1][same]
        gap = (d[1:] - d[:-1])[same]
        if len(ku) == 0:
            return empty
        order2 = np.lexsort((gap, ku))
        ku, gap = ku[order2], gap[order2]
        starts = np.flatnonzero(np.r_[True, ku[1:] != ku[:-1]])
        n = np.diff(np.r_[starts, len(ku)])
        med = gap[starts + (n - 1) // 2]
        return pa.table(
            {
                "o_custkey": pa.array(ku[starts], pa.int64()),
                "n_gaps": pa.array(n.astype(np.int64), pa.int64()),
                "median_gap_days": pa.array(med, pa.int64()),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks, stable_pandas

    out = _stable_t(
        stable_pandas(
            drop_empty_blocks(
                _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"])
                .map_batches(tag, batch_format="pyarrow")
                .groupby("part")
                .map_groups(kernel, batch_format="pyarrow")
                .materialize()
            )
        ),
        empty,
    ).sort_values("o_custkey")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_CUSTOMER_ORDER_CADENCE = """
WITH s AS (SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS d,
                  lead(epoch_us(o_orderdate) // 86400000000) OVER
                    (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS nd
           FROM orders),
g AS (SELECT o_custkey, nd - d AS gap_d FROM s WHERE nd IS NOT NULL)
SELECT o_custkey, count(*)::BIGINT AS n_gaps,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_d)::BIGINT
         AS median_gap_days
FROM g GROUP BY 1 ORDER BY 1
"""


def q_value_quantile_sketch(sf_dir: str):
    """Approximate global quantiles via the mergeable deterministic
    summary (functions/sketch.py quantile_summary_partial): each batch
    forwards ≤512 weighted order statistics (rank error ≤ N/1024 total),
    the driver merges by concatenation + weighted inverse CDF.  The
    100-TB path for CONTINUOUS values where the exact histogram's
    domain-bounded assumption fails.  No SQL oracle (approximate by
    construction); the engine test pins the rank-error bound against the
    exact quantiles."""
    from anansi_ray.functions.sketch import (
        quantile_summary_estimate,
        quantile_summary_partial,
    )

    summary = (
        _read(sf_dir, "events", ["value"])
        .map_batches(
            lambda b: quantile_summary_partial(b, "value"),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    p50, p90, p99 = quantile_summary_estimate(summary, [0.5, 0.9, 0.99])
    return pa.table(
        {
            "p50_approx": pa.array([round(p50, 6)], pa.float64()),
            "p90_approx": pa.array([round(p90, 6)], pa.float64()),
            "p99_approx": pa.array([round(p99, 6)], pa.float64()),
        }
    )


def _customer_rfm_base(sf_dir: str):
    """Customer-level (recency, frequency, monetary) metrics: one algebraic
    custkey groupby (Max/Count/Sum — combiner-friendly), recency measured
    in days back from the corpus's last order day."""
    from ray.data.aggregate import Count, Max, Sum

    DAY_US = 86_400_000_000

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "dayno": pa.array(
                    ts_us(b["o_orderdate"]).to_numpy(zero_copy_only=False)
                    // DAY_US,
                    pa.int64(),
                ),
                "cents": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64()
                ),
            }
        )

    from anansi_ray.arrowds import coarse_agg

    base = coarse_agg(
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow"),
        "o_custkey",
        {
            "last_day": ("max", "dayno"),
            "freq": ("count", "dayno"),
            "monetary": ("sum", "cents"),
        },
    ).to_pandas()
    base = _stable(
        base,
        {
            "o_custkey": "int64",
            "last_day": "int64",
            "freq": "int64",
            "monetary": "int64",
        },
    )
    max_day = int(base["last_day"].max()) if len(base) else 0
    base["recency"] = (max_day - base["last_day"]).astype("int64")
    base["freq"] = base["freq"].astype("int64")
    base["monetary"] = base["monetary"].astype("int64")
    return base


def _quintile_cuts(v: np.ndarray) -> list[int]:
    """p20/p40/p60/p80 cut points under the shared ``cum >= ceil(q·tot)``
    lower-inverse-CDF convention (computed from the value histogram, so
    the same cuts fall out of a domain-bounded distributed histogram at
    scale)."""
    vals, cnt = np.unique(v, return_counts=True)
    return [_inv_cdf(vals, cnt, q) for q in (0.2, 0.4, 0.6, 0.8)]


def q_customer_rfm(sf_dir: str):
    """RFM scoring (the classic retention segmentation): per customer,
    quintile scores 1–5 for recency (lower = better = 5), frequency and
    monetary value.  Scores come from QUANTILE THRESHOLDS (score = 1 +
    #cuts at-or-below the value), not NTILE row-splitting, so ties score
    identically, the result is permutation-invariant, and the
    distributed plan needs only the customer-level algebraic groupby plus
    three domain-bounded histograms — no global sort, no row numbering."""
    base = _customer_rfm_base(sf_dir)

    def score(v: np.ndarray, cuts: list[int], invert: bool) -> np.ndarray:
        # score = 1 + #cuts strictly below the value (ties-at-cut go LOW,
        # so equal values always score equally); recency inverts (recent
        # = low days = best = 5)
        s = 1 + sum((v > c).astype(np.int64) for c in cuts)
        return (6 - s) if invert else s

    out = base.sort_values("o_custkey")
    if len(out) == 0:
        return pa.table(
            {
                "o_custkey": pa.array([], pa.int64()),
                "r_score": pa.array([], pa.int64()),
                "f_score": pa.array([], pa.int64()),
                "m_score": pa.array([], pa.int64()),
            }
        )
    r = score(out["recency"].to_numpy(), _quintile_cuts(out["recency"].to_numpy()), True)
    f = score(out["freq"].to_numpy(), _quintile_cuts(out["freq"].to_numpy()), False)
    m = score(
        out["monetary"].to_numpy(), _quintile_cuts(out["monetary"].to_numpy()), False
    )
    return pa.table(
        {
            "o_custkey": pa.array(out["o_custkey"].to_numpy(np.int64), pa.int64()),
            "r_score": pa.array(r, pa.int64()),
            "f_score": pa.array(f, pa.int64()),
            "m_score": pa.array(m, pa.int64()),
        }
    )


SQL_CUSTOMER_RFM = """
WITH b AS (SELECT o_custkey,
                  max(epoch_us(o_orderdate) // 86400000000) AS last_day,
                  count(*) AS freq,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary
           FROM orders GROUP BY 1),
m AS (SELECT max(last_day) AS max_day FROM b),
r AS (SELECT o_custkey, (max_day - last_day) AS recency, freq, monetary
      FROM b CROSS JOIN m),
cuts AS (
  SELECT metric, q,
         min(CASE WHEN cum >= ceil(qq * tot) THEN v END) AS cut
  FROM (
    SELECT metric, v, cnt,
           sum(cnt) OVER (PARTITION BY metric ORDER BY v) AS cum,
           sum(cnt) OVER (PARTITION BY metric) AS tot
    FROM (SELECT 'r' AS metric, recency AS v, count(*) AS cnt FROM r GROUP BY 1, 2
          UNION ALL
          SELECT 'f', freq, count(*) FROM r GROUP BY 1, 2
          UNION ALL
          SELECT 'm', monetary, count(*) FROM r GROUP BY 1, 2)
  ) h CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS q,
                         unnest([0.2, 0.4, 0.6, 0.8]) AS qq)
  GROUP BY 1, 2, qq
),
p AS (SELECT metric, list(cut ORDER BY q) AS c FROM cuts GROUP BY 1)
SELECT r.o_custkey,
       (6 - (1 + (recency > pr.c[1])::INT + (recency > pr.c[2])::INT
               + (recency > pr.c[3])::INT + (recency > pr.c[4])::INT))::BIGINT
         AS r_score,
       (1 + (freq > pf.c[1])::INT + (freq > pf.c[2])::INT
          + (freq > pf.c[3])::INT + (freq > pf.c[4])::INT)::BIGINT AS f_score,
       (1 + (monetary > pm.c[1])::INT + (monetary > pm.c[2])::INT
          + (monetary > pm.c[3])::INT + (monetary > pm.c[4])::INT)::BIGINT
         AS m_score
FROM r, p pr, p pf, p pm
WHERE pr.metric = 'r' AND pf.metric = 'f' AND pm.metric = 'm'
ORDER BY r.o_custkey
"""


def q_revenue_pareto(sf_dir: str):
    """Pareto concentration ("how many customers produce 80% of
    revenue"): customer revenue via the algebraic groupby, then the
    answer reads off the revenue-value HISTOGRAM — customers sharing a
    revenue value contribute interchangeably, so the minimal count is
    #customers in higher value classes + the partial take from the
    boundary class: no global sort, no row numbering, deterministic
    regardless of tie order."""
    from ray.data.aggregate import Sum

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "cents": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64()
                ),
            }
        )

    from anansi_ray.arrowds import coarse_agg

    rev = coarse_agg(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        "o_custkey",
        {"rev": ("sum", "cents")},
    ).to_pandas()
    rev = _stable(rev, {"o_custkey": "int64", "rev": "int64"})
    if len(rev) == 0:
        # SQL twin on empty: n_customers = count-over-empty = 0, the
        # min/max aggregates go NULL
        return pa.table(
            {
                "n_customers": pa.array([0], pa.int64()),
                "n_top80": pa.array([None], pa.int64()),
                "total_rev_cents": pa.array([None], pa.int64()),
            }
        )
    vals, cnt = np.unique(rev["rev"].to_numpy(), return_counts=True)
    # descending revenue classes
    vals, cnt = vals[::-1], cnt[::-1]
    class_rev = vals * cnt
    cum_rev = class_rev.cumsum()
    tot = int(cum_rev[-1])
    target = int(np.ceil(0.8 * tot))
    k = int(np.searchsorted(cum_rev, target, side="left"))
    above_rev = int(cum_rev[k - 1]) if k > 0 else 0
    above_n = int(cnt[:k].sum())
    need = int(np.ceil((target - above_rev) / vals[k]))
    return pa.table(
        {
            "n_customers": pa.array([int(cnt.sum())], pa.int64()),
            "n_top80": pa.array([above_n + need], pa.int64()),
            "total_rev_cents": pa.array([tot], pa.int64()),
        }
    )


SQL_REVENUE_PARETO = """
WITH r AS (SELECT o_custkey,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
           FROM orders GROUP BY 1),
w AS (SELECT rev,
             sum(rev) OVER (ORDER BY rev DESC, o_custkey) AS cum,
             sum(rev) OVER () AS tot,
             row_number() OVER (ORDER BY rev DESC, o_custkey) AS rn
      FROM r)
SELECT (SELECT count(*) FROM r)::BIGINT AS n_customers,
       min(rn)::BIGINT AS n_top80,
       max(tot)::BIGINT AS total_rev_cents
FROM w WHERE cum >= ceil(0.8 * tot)
"""


def q_k_anonymity(sf_dir: str):
    """k-anonymity audit (data-governance primitive): how many
    quasi-identifier groups — (status, priority, 30-day bucket) — have
    fewer than k=10 members, and how many rows sit in them.  Per-batch
    composite-key combiner BEFORE the exchange, one catalog-sized
    groupby, three-scalar driver finish."""
    from ray.data.aggregate import Sum

    K = 10
    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        mo = (
            ts_us(b["o_orderdate"]).to_numpy(zero_copy_only=False)
            // DAY_US
            // 30
        )
        df = pd.DataFrame(
            {
                "o_orderstatus": b["o_orderstatus"].to_numpy(zero_copy_only=False),
                "o_orderpriority": b["o_orderpriority"].to_numpy(
                    zero_copy_only=False
                ),
                "mo": mo,
            }
        )
        g = df.groupby(
            ["o_orderstatus", "o_orderpriority", "mo"], sort=False
        ).size()
        out = g.reset_index(name="n")
        return pa.table(
            {
                "o_orderstatus": pa.array(
                    out["o_orderstatus"].to_numpy(object), pa.string()
                ),
                "o_orderpriority": pa.array(
                    out["o_orderpriority"].to_numpy(object), pa.string()
                ),
                "mo": pa.array(out["mo"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    g = (
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_orderdate"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority", "mo"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    g = _stable(
        g,
        {
            "o_orderstatus": "object",
            "o_orderpriority": "object",
            "mo": "int64",
            "n": "int64",
        },
    )
    n = g["n"].to_numpy()
    small = n < K
    if len(n) == 0:
        # SQL twin on empty: the group count is 0 but its SUM-based
        # companions aggregate over nothing and go NULL
        return pa.table(
            {
                "n_groups": pa.array([0], pa.int64()),
                "n_small_groups": pa.array([None], pa.int64()),
                "n_rows_at_risk": pa.array([None], pa.int64()),
            }
        )
    return pa.table(
        {
            "n_groups": pa.array([len(n)], pa.int64()),
            "n_small_groups": pa.array([int(small.sum())], pa.int64()),
            "n_rows_at_risk": pa.array([int(n[small].sum())], pa.int64()),
        }
    )


SQL_K_ANONYMITY = """
WITH g AS (SELECT o_orderstatus, o_orderpriority,
                  (epoch_us(o_orderdate) // 86400000000) // 30 AS mo,
                  count(*) AS n
           FROM orders GROUP BY 1, 2, 3)
SELECT count(*)::BIGINT AS n_groups,
       sum(CASE WHEN n < 10 THEN 1 ELSE 0 END)::BIGINT AS n_small_groups,
       sum(CASE WHEN n < 10 THEN n ELSE 0 END)::BIGINT AS n_rows_at_risk
FROM g
"""


def q_impute_missing(sf_dir: str):
    """Group-mean imputation (data repair): events whose ``event_id % 13
    == 0`` are treated as missing their value (deterministic synthetic
    missingness, same device as the URL-synthesis queries) and imputed
    with the per-type INTEGER mean (fixed-point floor division — exact on
    both engines, no float averaging).  Pass 1: per-batch (type, Σvfp, n)
    partials over non-missing rows → tiny groupby; pass 2 re-streams the
    missing rows with the catalog-sized mean table in the closure."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        keep = eid % 13 != 0
        et = b["event_type"].to_numpy(zero_copy_only=False)[keep]
        vfp = np.floor(
            b["value"].to_numpy(zero_copy_only=False)[keep] * 10000.0
        ).astype(np.int64)
        types, inv = np.unique(et, return_inverse=True)
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "s": pa.array(np.bincount(inv, weights=vfp).astype(np.int64), pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            }
        )

    means = (
        _read(sf_dir, "events", ["event_id", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    means = _stable(means, {"event_type": "object", "s": "int64", "n": "int64"})
    mean_fp = {
        t: int(s) // int(n)
        for t, s, n in zip(means["event_type"], means["s"], means["n"])
    }

    def impute(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        m = eid % 13 == 0
        et = b["event_type"].to_numpy(zero_copy_only=False)[m]
        # factorize once per batch, probe the catalog dict once per TYPE
        types, inv = np.unique(et, return_inverse=True)
        lut = np.array([mean_fp[t] for t in types], dtype=np.int64)
        return pa.table(
            {
                "event_id": pa.array(eid[m], pa.int64()),
                "event_type": pa.array(et, pa.string()),
                "value_fp": pa.array(lut[inv] if len(types) else lut, pa.int64()),
            }
        )

    out = _stable(
        _read(sf_dir, "events", ["event_id", "event_type"])
        .map_batches(impute, batch_format="pyarrow")
        .to_pandas(),
        {"event_id": "int64", "event_type": "object", "value_fp": "int64"},
    ).sort_values("event_id")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_IMPUTE_MISSING = """
WITH m AS (SELECT event_type, sum(floor(value * 10000)::BIGINT) AS s,
                  count(*) AS n
           FROM events WHERE event_id % 13 <> 0 GROUP BY 1)
SELECT e.event_id, e.event_type, (m.s // m.n)::BIGINT AS value_fp
FROM events e JOIN m USING (event_type)
WHERE e.event_id % 13 = 0 ORDER BY e.event_id
"""


def q_gini_coefficient(sf_dir: str):
    """Gini inequality coefficient of customer revenue — the classic
    concentration statistic, computed EXACTLY from the revenue value
    histogram: for a value class (x, c) starting at cumulative position s,
    Σ rank·x over the class is x·(c·s + c(c+1)/2), so
    G = 2·Σ rank·x / (n·Σx) − (n+1)/n falls out of one algebraic groupby
    + one domain-bounded histogram with INTEGER arithmetic until the final
    division — permutation-invariant under ties, no global sort."""
    from ray.data.aggregate import Sum

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "cents": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64()
                ),
            }
        )

    from anansi_ray.arrowds import coarse_agg

    rev = coarse_agg(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        "o_custkey",
        {"rev": ("sum", "cents")},
    ).to_pandas()
    rev = _stable(rev, {"o_custkey": "int64", "rev": "int64"})
    if len(rev) == 0:
        # SQL aggregate-over-empty: one all-NULL row
        return pa.table(
            {
                "n_customers": pa.array([None], pa.int64()),
                "gini": pa.array([None], pa.float64()),
            }
        )
    vals, cnt = np.unique(rev["rev"].to_numpy(), return_counts=True)
    n = int(cnt.sum())
    tot = int((vals * cnt).sum())
    starts = np.concatenate(([0], cnt.cumsum()[:-1]))
    # Σ rank·x with ranks 1..n ascending (integer-exact)
    rank_sum = int((vals * (cnt * starts + cnt * (cnt + 1) // 2)).sum())
    gini = 2.0 * rank_sum / (n * tot) - (n + 1) / n
    return pa.table(
        {
            "n_customers": pa.array([n], pa.int64()),
            "gini": pa.array([round(gini, 6)], pa.float64()),
        }
    )


SQL_GINI_COEFFICIENT = """
WITH r AS (SELECT o_custkey,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
           FROM orders GROUP BY 1),
w AS (SELECT rev,
             row_number() OVER (ORDER BY rev, o_custkey) AS rn,
             count(*) OVER () AS n,
             sum(rev) OVER () AS tot
      FROM r)
SELECT max(n)::BIGINT AS n_customers,
       round(2.0 * sum(rn * rev) / (max(n) * max(tot))
             - (max(n) + 1.0) / max(n), 6) AS gini
FROM w
"""


def q_nb_token_model(sf_dir: str):
    """Naive-Bayes training table (language-conditional token counts):
    the top-20 tokens per language by corpus count.  Per-batch (lang,
    token) count combiner BEFORE the exchange, groupby-sum, then a
    per-batch partial top-20-per-lang so the driver finish sees
    #batches × |langs| × 20 rows, never the vocabulary."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        lang = b["lang"].to_numpy(zero_copy_only=False)
        col = pc.fill_null(b["text"], "")
        toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\W+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_pandas()
        lg = np.repeat(lang, lens)
        mask = (flat.str.len() > 0).to_numpy()
        df = (
            pd.DataFrame({"lang": lg[mask], "token": flat[mask]})
            .groupby(["lang", "token"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "lang": pa.array(df["lang"].to_numpy(object), pa.string()),
                "token": pa.array(df["token"].to_numpy(object), pa.string()),
                "cnt": pa.array(df["cnt"].to_numpy(np.int64), pa.int64()),
            }
        )

    def topk_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(
            ["lang", "cnt", "token"], ascending=[True, False, True]
        )
        df = df.groupby("lang", sort=False).head(20)
        return pa.Table.from_pandas(df, preserve_index=False)

    from anansi_ray.arrowds import coarse_agg

    out = (
        coarse_agg(
            _read(sf_dir, "documents", ["lang", "text"]).map_batches(
                partial, batch_format="pyarrow"
            ),
            ["lang", "token"],
            {"cnt": ("sum", "cnt")},
        )
        .map_batches(topk_partial, batch_format="pyarrow")
        .to_pandas()
    )
    out = _stable(out, {"lang": "object", "token": "object", "cnt": "int64"})
    out = out.sort_values(
        ["lang", "cnt", "token"], ascending=[True, False, True]
    )
    out = out.groupby("lang", sort=False).head(20).reset_index(drop=True)
    out["cnt"] = out["cnt"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_NB_TOKEN_MODEL = r"""
WITH tok AS (
  SELECT lang,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\w+')) AS token
  FROM documents),
c AS (SELECT lang, token, count(*)::BIGINT AS cnt FROM tok GROUP BY 1, 2),
r AS (SELECT lang, token, cnt,
             row_number() OVER
               (PARTITION BY lang ORDER BY cnt DESC, token) AS rn
      FROM c)
SELECT lang, token, cnt FROM r WHERE rn <= 20 ORDER BY lang, cnt DESC, token
"""


def q_daily_anomalies(sf_dir: str):
    """Time-series anomaly detection with INTEGER-EXACT z-score test:
    per event type, flag days whose count deviates > 2σ from the type's
    daily mean.  (cnt−μ)² > 4σ² is multiplied through by n² so both
    engines compare (n·cnt − S)² > 4·(n·S2 − S²) in pure integers — no
    float variance crosses engines.  One catalog-sized (type, day)
    histogram exchange; the test runs on the |types|×|days| result."""
    from ray.data.aggregate import Sum

    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        d = ts_us(b["ts"]).to_numpy(zero_copy_only=False) // DAY_US
        types, tinv = np.unique(et, return_inverse=True)
        dmin = d.min() if len(d) else 0
        span = int(d.max() - dmin) + 1 if len(d) else 1
        key, inv = np.unique(tinv * span + (d - dmin), return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        first = np.full(len(key), np.iinfo(np.int64).max)
        np.minimum.at(first, inv, np.arange(len(inv)))
        return pa.table(
            {
                "event_type": pa.array(et[first], pa.string()),
                "dayno": pa.array(d[first], pa.int64()),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    hist = (
        _read(sf_dir, "events", ["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "dayno"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    hist = _stable(
        hist, {"event_type": "object", "dayno": "int64", "n": "int64"}
    )
    rows = []
    for et, grp in hist.groupby("event_type"):
        c = grp["n"].to_numpy().astype(object)  # python ints: no overflow
        n = len(c)
        S = sum(c)
        S2 = sum(x * x for x in c)
        lhs = [(n * x - S) ** 2 for x in c]
        rhs = 4 * (n * S2 - S * S)
        for day, cnt, l in zip(grp["dayno"], grp["n"], lhs):
            if l > rhs:
                rows.append((et, int(day), int(cnt)))
    rows.sort()
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "dayno": pa.array([r[1] for r in rows], pa.int64()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


SQL_DAILY_ANOMALIES = """
WITH c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS dayno,
                  count(*)::HUGEINT AS n
           FROM events GROUP BY 1, 2),
s AS (SELECT event_type, count(*)::HUGEINT AS nn, sum(n) AS S,
             sum(n * n) AS S2
      FROM c GROUP BY 1)
SELECT c.event_type, c.dayno::BIGINT AS dayno, c.n::BIGINT AS n
FROM c JOIN s USING (event_type)
WHERE (s.nn * c.n - s.S) * (s.nn * c.n - s.S) > 4 * (s.nn * s.S2 - s.S * s.S)
ORDER BY 1, 2
"""


def q_duplicate_orders_audit(sf_dir: str):
    """Same-day repeat-order audit: (custkey, day) pairs with more than
    one order — the financial-integrity HAVING>1 shape.  Per-batch
    composite-key combiner, ONE groupby, HAVING filter inside the Dataset
    plan (the non-duplicate mass never reaches the driver)."""
    from ray.data.aggregate import Sum

    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False)
        d = (
            ts_us(b["o_orderdate"]).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        order = np.lexsort((d, k))
        ks, ds = k[order], d[order]
        starts = np.flatnonzero(
            np.r_[True, (ks[1:] != ks[:-1]) | (ds[1:] != ds[:-1])]
        )
        n = np.diff(np.r_[starts, len(ks)])
        return pa.table(
            {
                "o_custkey": pa.array(ks[starts], pa.int64()),
                "dayno": pa.array(ds[starts], pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    def having(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["n"], 1))

    from anansi_ray.arrowds import coarse_agg

    out = (
        coarse_agg(
            _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
                partial, batch_format="pyarrow"
            ),
            ["o_custkey", "dayno"],
            {"n": ("sum", "n")},
        )
        .map_batches(having, batch_format="pyarrow")
        .to_pandas()
    )
    out = _stable(
        out, {"o_custkey": "int64", "dayno": "int64", "n": "int64"}
    ).sort_values(["o_custkey", "dayno"])
    for c in ("o_custkey", "dayno", "n"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_DUPLICATE_ORDERS_AUDIT = """
SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS dayno,
       count(*)::BIGINT AS n
FROM orders GROUP BY 1, 2 HAVING count(*) > 1 ORDER BY 1, 2
"""


def q_user_coverage_audit(sf_dir: str):
    """Cross-table key-coverage audit (full-outer-join cardinality without
    the join): |event users ∩ customers|, events-only, customers-only —
    per-batch distinct-key combiners on each side, one shared key-hash
    exchange with a side bitmask OR-reduce per key, three-scalar finish."""
    from ray.data.aggregate import Max

    def partial(col: str, is_events: bool):
        def fn(b: pa.Table) -> pa.Table:
            u = np.unique(b[col].to_numpy(zero_copy_only=False))
            one = np.full(len(u), 1, np.int64)
            zero = np.zeros(len(u), np.int64)
            return pa.table(
                {
                    "key": pa.array(u, pa.int64()),
                    "m_e": pa.array(one if is_events else zero, pa.int64()),
                    "m_c": pa.array(zero if is_events else one, pa.int64()),
                }
            )

        return fn

    def count_partial(b: pa.Table) -> pa.Table:
        # after the per-key aggregate each key appears exactly once, so
        # per-block counts of the three outcomes sum to the global answer
        e = b["m_e"].to_numpy(zero_copy_only=False) > 0
        c = b["m_c"].to_numpy(zero_copy_only=False) > 0
        return pa.table(
            {
                "n_both": pa.array([int((e & c).sum())], pa.int64()),
                "n_events_only": pa.array([int((e & ~c).sum())], pa.int64()),
                "n_customers_only": pa.array([int((~e & c).sum())], pa.int64()),
            }
        )

    ev = _read(sf_dir, "events", ["user_id"]).map_batches(
        partial("user_id", True), batch_format="pyarrow"
    )
    cu = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        partial("c_custkey", False), batch_format="pyarrow"
    )
    from anansi_ray.arrowds import drop_empty_blocks

    from anansi_ray.arrowds import coarse_agg

    parts = (
        coarse_agg(
            drop_empty_blocks(ev.union(cu).materialize()),
            "key",
            {"m_e": ("max", "m_e"), "m_c": ("max", "m_c")},
        )
        .map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()
    )
    parts = _stable(
        parts,
        {"n_both": "int64", "n_events_only": "int64", "n_customers_only": "int64"},
    )
    return pa.table(
        {
            "n_both": pa.array([int(parts["n_both"].sum())], pa.int64()),
            "n_events_only": pa.array(
                [int(parts["n_events_only"].sum())], pa.int64()
            ),
            "n_customers_only": pa.array(
                [int(parts["n_customers_only"].sum())], pa.int64()
            ),
        }
    )


SQL_USER_COVERAGE_AUDIT = """
WITH e AS (SELECT DISTINCT user_id AS key FROM events),
c AS (SELECT DISTINCT c_custkey AS key FROM customer)
SELECT (SELECT count(*) FROM e JOIN c USING (key))::BIGINT AS n_both,
       (SELECT count(*) FROM e ANTI JOIN c USING (key))::BIGINT
         AS n_events_only,
       (SELECT count(*) FROM c ANTI JOIN e USING (key))::BIGINT
         AS n_customers_only
"""


def q_part_return_rates(sf_dir: str):
    """Return-rate per brand through a fact ⋈ fact-sized-dim join: at
    100 TB the part table is NOT broadcastable, so both sides exchange
    ONCE on ``partkey % P`` — the lineitem side pre-reduced per batch to
    (partkey, returned, total) partials, the part side carrying only
    (partkey, brand) — and the partition kernel resolves brand via
    ``searchsorted`` against its local dim slice, forwarding per-brand
    partials (≤ |brands| rows per partition)."""
    from ray.data.aggregate import Sum

    P = 32

    def li_partial(b: pa.Table) -> pa.Table:
        k = b["l_partkey"].to_numpy(zero_copy_only=False)
        ret = (
            b["l_returnflag"].to_numpy(zero_copy_only=False) == "R"
        ).astype(np.int64)
        keys, inv = np.unique(k, return_inverse=True)
        tot = np.bincount(inv).astype(np.int64)
        r = np.bincount(inv, weights=ret).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((keys % P).astype(np.int32), pa.int32()),
                "key": pa.array(keys, pa.int64()),
                "brand": pa.array([""] * len(keys), pa.string()),
                "ret": pa.array(r, pa.int64()),
                "tot": pa.array(tot, pa.int64()),
            }
        )

    def part_side(b: pa.Table) -> pa.Table:
        k = b["p_partkey"].to_numpy(zero_copy_only=False)
        n = len(k)
        return pa.table(
            {
                "part": pa.array((k % P).astype(np.int32), pa.int32()),
                "key": pa.array(k, pa.int64()),
                "brand": b["p_brand"],
                "ret": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "tot": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    empty = pa.table(
        {
            "p_brand": pa.array([], pa.string()),
            "n_lineitems": pa.array([], pa.int64()),
            "n_returned": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        ret = g["ret"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        is_dim = ret == -1
        dk = key[is_dim]
        db = g["brand"].to_numpy(zero_copy_only=False)[is_dim]
        order = np.argsort(dk, kind="stable")
        dk, db = dk[order], db[order]
        fk = key[~is_dim]
        fr = ret[~is_dim]
        ft = g["tot"].to_numpy(zero_copy_only=False)[~is_dim]
        # inner-join semantics: drop fact rows whose dim key is absent
        # (FK integrity holds in full TPC-H data, but a sliced/filtered
        # input must not crash or mis-assign to a neighboring key)
        idx = np.clip(np.searchsorted(dk, fk), 0, max(len(dk) - 1, 0))
        hit = (dk[idx] == fk) if len(dk) else np.zeros(len(fk), bool)
        if not hit.any():
            return empty
        fr, ft = fr[hit], ft[hit]
        brands = db[idx[hit]]
        u, inv = np.unique(brands, return_inverse=True)
        return pa.table(
            {
                "p_brand": pa.array(u, pa.string()),
                "n_lineitems": pa.array(
                    np.bincount(inv, weights=ft).astype(np.int64), pa.int64()
                ),
                "n_returned": pa.array(
                    np.bincount(inv, weights=fr).astype(np.int64), pa.int64()
                ),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_returnflag"]).map_batches(
        li_partial, batch_format="pyarrow"
    )
    pt = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        part_side, batch_format="pyarrow"
    )
    out = (
        drop_empty_blocks(li.union(pt).materialize())
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Sum("n_lineitems", alias_name="n_lineitems"),
            Sum("n_returned", alias_name="n_returned"),
        )
        .to_pandas()
    )
    out = _stable(
        out,
        {"p_brand": "object", "n_lineitems": "int64", "n_returned": "int64"},
    ).sort_values("p_brand")
    for c in ("n_lineitems", "n_returned"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_PART_RETURN_RATES = """
SELECT p.p_brand, count(*)::BIGINT AS n_lineitems,
       sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
         AS n_returned
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1 ORDER BY 1
"""


def q_ship_latency(sf_dir: str):
    """Order-to-first-ship latency quantiles per priority: orders ⋈
    lineitem co-partitioned on orderkey (lineitem pre-reduced per batch to
    (orderkey, min shipday)), per-order gap days in the partition kernel,
    then the small-domain (priority, gap) histogram finishes with the
    shared inverse-CDF convention."""
    from ray.data.aggregate import Sum

    P = 32
    DAY_US = 86_400_000_000

    def li_partial(b: pa.Table) -> pa.Table:
        k = b["l_orderkey"].to_numpy(zero_copy_only=False)
        d = (
            ts_us(b["l_shipdate"]).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        keys, inv = np.unique(k, return_inverse=True)
        mn = np.full(len(keys), np.iinfo(np.int64).max)
        np.minimum.at(mn, inv, d)
        return pa.table(
            {
                "part": pa.array((keys % P).astype(np.int32), pa.int32()),
                "key": pa.array(keys, pa.int64()),
                "day": pa.array(mn, pa.int64()),
                "pri": pa.array([""] * len(keys), pa.string()),
                "side": pa.array(np.zeros(len(keys), np.int8), pa.int8()),
            }
        )

    def o_side(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        d = (
            ts_us(b["o_orderdate"]).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        return pa.table(
            {
                "part": pa.array((k % P).astype(np.int32), pa.int32()),
                "key": pa.array(k, pa.int64()),
                "day": pa.array(d, pa.int64()),
                "pri": b["o_orderpriority"],
                "side": pa.array(np.ones(len(k), np.int8), pa.int8()),
            }
        )

    empty = pa.table(
        {
            "pri": pa.array([], pa.string()),
            "gap": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        day = g["day"].to_numpy(zero_copy_only=False)
        om = side == 1
        ok, od = key[om], day[om]
        op = g["pri"].to_numpy(zero_copy_only=False)[om]
        order = np.argsort(ok, kind="stable")
        ok, od, op = ok[order], od[order], op[order]
        lm = ~om
        lk = key[lm]
        lmin = day[lm]
        if len(lk) == 0 or len(ok) == 0:
            return empty
        # combine lineitem partials per orderkey (several batches may
        # contribute a min for the same order)
        lo = np.argsort(lk, kind="stable")
        lk, lmin = lk[lo], lmin[lo]
        starts = np.flatnonzero(np.r_[True, lk[1:] != lk[:-1]])
        lkey = lk[starts]
        lday = np.minimum.reduceat(lmin, starts)
        # inner-join semantics: drop lineitem keys whose order row is
        # absent from this partition's slice of the input
        idx = np.clip(np.searchsorted(ok, lkey), 0, len(ok) - 1)
        hit = ok[idx] == lkey
        if not hit.any():
            return empty
        gap = lday[hit] - od[idx[hit]]
        pri = op[idx[hit]]
        import pandas as pd

        df = (
            pd.DataFrame({"pri": pri, "gap": gap})
            .groupby(["pri", "gap"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "pri": pa.array(df["pri"].to_numpy(object), pa.string()),
                "gap": pa.array(df["gap"].to_numpy(np.int64), pa.int64()),
                "cnt": pa.array(df["cnt"].to_numpy(np.int64), pa.int64()),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        li_partial, batch_format="pyarrow"
    )
    od = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(o_side, batch_format="pyarrow")
    hist = (
        drop_empty_blocks(li.union(od).materialize())
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby(["pri", "gap"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    hist = _stable(hist, {"pri": "object", "gap": "int64", "cnt": "int64"})
    rows = []
    for pri, grp in hist.groupby("pri"):
        grp = grp.sort_values("gap")
        v = grp["gap"].to_numpy()
        c = grp["cnt"].to_numpy()
        rows.append(
            (pri, int(c.sum()), _inv_cdf(v, c, 0.5), _inv_cdf(v, c, 0.9))
        )
    rows.sort()
    return pa.table(
        {
            "o_orderpriority": pa.array([r[0] for r in rows], pa.string()),
            "n_orders": pa.array([r[1] for r in rows], pa.int64()),
            "p50_days": pa.array([r[2] for r in rows], pa.int64()),
            "p90_days": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


SQL_SHIP_LATENCY = """
WITH f AS (SELECT l_orderkey,
                  min(epoch_us(l_shipdate) // 86400000000) AS ship_day
           FROM lineitem GROUP BY 1),
g AS (SELECT o.o_orderpriority AS pri,
             f.ship_day - epoch_us(o.o_orderdate) // 86400000000 AS gap
      FROM orders o JOIN f ON f.l_orderkey = o.o_orderkey),
h AS (SELECT pri, gap, count(*) AS cnt FROM g GROUP BY 1, 2),
w AS (SELECT pri, gap, cnt,
             sum(cnt) OVER (PARTITION BY pri ORDER BY gap) AS cum,
             sum(cnt) OVER (PARTITION BY pri) AS tot
      FROM h)
SELECT pri AS o_orderpriority, max(tot)::BIGINT AS n_orders,
       min(CASE WHEN cum >= ceil(0.5 * tot) THEN gap END)::BIGINT AS p50_days,
       min(CASE WHEN cum >= ceil(0.9 * tot) THEN gap END)::BIGINT AS p90_days
FROM w GROUP BY 1 ORDER BY 1
"""


def q_hapax_stats(sf_dir: str):
    """Per-document lexical statistics (type-token ratio building block):
    total tokens, distinct types, and within-doc hapax legomena (tokens
    occurring exactly once in the doc).  Documents never split across
    batches, so the whole operator is ONE streaming pass with ZERO
    exchange — the per-batch kernel factorizes (doc, token) pairs and
    counts with ``bincount``."""
    import pandas as pd

    def kernel(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        col = pc.fill_null(b["text"], "")
        toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\W+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_pandas()
        doc = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        mask = (flat.str.len() > 0).to_numpy()
        df = pd.DataFrame({"d": doc[mask], "t": flat[mask].to_numpy()})
        per = df.groupby(["d", "t"], sort=False).size()
        dd = per.index.get_level_values(0).to_numpy()
        c = per.to_numpy()
        n_tok = np.bincount(doc[mask], minlength=len(ids)).astype(np.int64)
        n_types = np.bincount(dd, minlength=len(ids)).astype(np.int64)
        n_hapax = np.bincount(dd, weights=(c == 1), minlength=len(ids)).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tok": pa.array(n_tok, pa.int64()),
                "n_types": pa.array(n_types, pa.int64()),
                "n_hapax": pa.array(n_hapax, pa.int64()),
            }
        )

    out = _stable(
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(kernel, batch_format="pyarrow")
        .to_pandas(),
        {
            "doc_id": "int64",
            "n_tok": "int64",
            "n_types": "int64",
            "n_hapax": "int64",
        },
    ).sort_values("doc_id")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_HAPAX_STATS = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\w+')) AS t
  FROM documents),
f AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2)
SELECT d.doc_id, coalesce(sum(f.c), 0)::BIGINT AS n_tok,
       coalesce(count(f.t), 0)::BIGINT AS n_types,
       coalesce(sum(CASE WHEN f.c = 1 THEN 1 ELSE 0 END), 0)::BIGINT
         AS n_hapax
FROM documents d LEFT JOIN f USING (doc_id) GROUP BY 1 ORDER BY 1
"""


def q_priority_price_extremes(sf_dir: str):
    """ARG-extremes with DETERMINISTIC tie-breaking: per priority, the
    cheapest and most expensive order and WHICH order holds each extreme
    (ties → smallest orderkey — DuckDB's arg_min leaves ties unspecified,
    so the twin pins the same rule explicitly).  Per-batch partial
    arg-extremes are associative under the (value, key) lexicographic
    order, so each batch forwards ≤ |priorities| rows."""
    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        pri = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        cents = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        key = b["o_orderkey"].to_numpy(zero_copy_only=False)
        # lexsort by (pri, cents, key): first row per pri = arg-min with
        # min-key tie rule; for arg-max sort (pri, -cents, key)
        rows = []
        for sign in (1, -1):
            order = np.lexsort((key, sign * cents, pri))
            p = pri[order]
            first = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
            rows.append((p[first], cents[order][first], key[order][first]))
        (pmin, cmin, kmin), (pmax, cmax, kmax) = rows
        df = pd.DataFrame(
            {
                "pri": pmin,
                "min_cents": cmin,
                "min_orderkey": kmin,
                "max_cents": cmax,
                "max_orderkey": kmax,
            }
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = (
        _read(
            sf_dir, "orders", ["o_orderpriority", "o_totalprice", "o_orderkey"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    parts = _stable(
        parts,
        {
            "pri": "object",
            "min_cents": "int64",
            "min_orderkey": "int64",
            "max_cents": "int64",
            "max_orderkey": "int64",
        },
    )
    rows = []
    for pri, grp in parts.groupby("pri"):
        lo = grp.sort_values(["min_cents", "min_orderkey"]).iloc[0]
        hi = grp.sort_values(
            ["max_cents", "max_orderkey"], ascending=[False, True]
        ).iloc[0]
        rows.append(
            (
                pri,
                int(lo["min_cents"]),
                int(lo["min_orderkey"]),
                int(hi["max_cents"]),
                int(hi["max_orderkey"]),
            )
        )
    rows.sort()
    return pa.table(
        {
            "o_orderpriority": pa.array([r[0] for r in rows], pa.string()),
            "min_cents": pa.array([r[1] for r in rows], pa.int64()),
            "min_orderkey": pa.array([r[2] for r in rows], pa.int64()),
            "max_cents": pa.array([r[3] for r in rows], pa.int64()),
            "max_orderkey": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


SQL_PRIORITY_PRICE_EXTREMES = """
WITH c AS (SELECT o_orderpriority AS pri, o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
lo AS (SELECT pri, min(cents) AS min_cents FROM c GROUP BY 1),
hi AS (SELECT pri, max(cents) AS max_cents FROM c GROUP BY 1)
SELECT lo.pri AS o_orderpriority, lo.min_cents,
       (SELECT min(o_orderkey) FROM c
         WHERE c.pri = lo.pri AND c.cents = lo.min_cents) AS min_orderkey,
       hi.max_cents,
       (SELECT min(o_orderkey) FROM c
         WHERE c.pri = hi.pri AND c.cents = hi.max_cents) AS max_orderkey
FROM lo JOIN hi USING (pri) ORDER BY 1
"""


def q_adoption_curve(sf_dir: str):
    """Cumulative adoption curve: per day, how many NEW users appeared
    (first-ever event) and the running total.  First-seen day is a
    per-batch (user, min day) combiner + ONE user groupby-min; the
    day-level count and cumulative sum finish on the catalog-sized
    |days| result driver-side."""
    from ray.data.aggregate import Min

    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        d = ts_us(b["ts"]).to_numpy(zero_copy_only=False) // DAY_US
        users, inv = np.unique(u, return_inverse=True)
        mn = np.full(len(users), np.iinfo(np.int64).max)
        np.minimum.at(mn, inv, d)
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "dayno": pa.array(mn, pa.int64()),
            }
        )

    from anansi_ray.arrowds import coarse_agg

    firsts = coarse_agg(
        _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        "user_id",
        {"dayno": ("min", "dayno")},
    ).to_pandas()
    firsts = _stable(firsts, {"user_id": "int64", "dayno": "int64"})
    days, cnt = np.unique(firsts["dayno"].to_numpy(), return_counts=True)
    return pa.table(
        {
            "dayno": pa.array(days, pa.int64()),
            "n_new": pa.array(cnt.astype(np.int64), pa.int64()),
            "n_cum": pa.array(cnt.cumsum().astype(np.int64), pa.int64()),
        }
    )


SQL_ADOPTION_CURVE = """
WITH f AS (SELECT user_id, min(epoch_us(ts) // 86400000000) AS dayno
           FROM events GROUP BY 1),
d AS (SELECT dayno, count(*) AS n_new FROM f GROUP BY 1)
SELECT dayno::BIGINT AS dayno, n_new::BIGINT AS n_new,
       sum(n_new) OVER (ORDER BY dayno)::BIGINT AS n_cum
FROM d ORDER BY dayno
"""


def q_merge_upsert(sf_dir: str):
    """Distributed MERGE / upsert (the CDC table-maintenance primitive):
    apply a change stream to a base table — latest change per key wins,
    keys only in the stream INSERT, keys only in the base KEEP.

    Base = customer balances (cents).  Change stream derives from orders:
    each customer's LATEST order (by orderdate, orderkey) updates their
    balance; every ``o_orderkey % 97 == 0`` order also inserts a fresh
    key (``o_orderkey + 10^10`` — disjoint from custkeys by construction).

    Scale shape: the change stream first collapses to one row per key
    with a per-batch latest-row combiner (lexsort, last-of-run) and ONE
    key-hash exchange whose partition kernel repeats the argmax — the
    standard distributed latest-wins reduction; base and changes then
    co-partition on the same key hash and each partition kernel resolves
    membership with one ``np.isin`` per side.  No row multiplication, no
    broadcast: both sides can be arbitrarily large."""
    P = 32
    DAY_US = 86_400_000_000
    INS_OFF = 10_000_000_000

    def chg_partial(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False)
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        day = ts_us(b["o_orderdate"]).to_numpy(zero_copy_only=False) // DAY_US
        bal = (
            pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        # latest row per key within the batch (combiner): lexsort by
        # (key, day, orderkey); the last row of each key run is the argmax
        order = np.lexsort((ok, day, k))
        ks = k[order]
        last = np.r_[ks[1:] != ks[:-1], True]
        sel = order[last]
        # pack the recency rank so partitions can re-argmax exactly:
        # day < 2^20 and orderkey < 2^43 at any tested scale
        pack = day[sel] * (1 << 43) + ok[sel]
        return pa.table(
            {
                "part": pa.array((ks[last] % P).astype(np.int32), pa.int32()),
                "key": pa.array(ks[last], pa.int64()),
                "pack": pa.array(pack, pa.int64()),
                "bal": pa.array(bal[sel], pa.int64()),
            }
        )

    def latest_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"key": pa.array([], pa.int64()), "bal": pa.array([], pa.int64())}
            )
        k = g["key"].to_numpy(zero_copy_only=False)
        pk = g["pack"].to_numpy(zero_copy_only=False)
        bal = g["bal"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, k))
        ks = k[order]
        last = np.r_[ks[1:] != ks[:-1], True]
        sel = order[last]
        return pa.table(
            {
                "key": pa.array(ks[last], pa.int64()),
                "bal": pa.array(bal[sel], pa.int64()),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    )
    updates = (
        orders.map_batches(chg_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(latest_kernel, batch_format="pyarrow")
    )

    def ins_rows(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        m = ok % 97 == 0
        bal = (
            pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)[m]
        )
        return pa.table(
            {
                "key": pa.array(ok[m] + INS_OFF, pa.int64()),
                "bal": pa.array(bal, pa.int64()),
            }
        )

    inserts = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        ins_rows, batch_format="pyarrow"
    )

    def tag(side: str):
        def _t(b: pa.Table) -> pa.Table:
            k = b["key"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "part": pa.array((k % P).astype(np.int32), pa.int32()),
                    "key": b["key"],
                    "bal": b["bal"],
                    "side": pa.array([side] * b.num_rows, pa.string()),
                }
            )

        return _t

    def base_rows(b: pa.Table) -> pa.Table:
        bal = (
            pc.cast(pc.round(pc.multiply(b["c_acctbal"], 100.0)), pa.int64())
        )
        return pa.table({"key": b["c_custkey"], "bal": bal})

    base = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        base_rows, batch_format="pyarrow"
    )

    empty = pa.table(
        {
            "key": pa.array([], pa.int64()),
            "balance_cents": pa.array([], pa.int64()),
            "action": pa.array([], pa.string()),
        }
    )

    def merge_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        k = g["key"].to_numpy(zero_copy_only=False)
        bal = g["bal"].to_numpy(zero_copy_only=False)
        is_c = side == "c"
        ck, cb = k[is_c], bal[is_c]
        bk, bb = k[~is_c], bal[~is_c]
        in_base = np.isin(ck, bk)
        keep = ~np.isin(bk, ck)
        out_k = np.concatenate([ck, bk[keep]])
        out_b = np.concatenate([cb, bb[keep]])
        out_a = np.concatenate(
            [
                np.where(in_base, "update", "insert"),
                np.full(int(keep.sum()), "keep", dtype=object),
            ]
        )
        return pa.table(
            {
                "key": pa.array(out_k, pa.int64()),
                "balance_cents": pa.array(out_b, pa.int64()),
                "action": pa.array(out_a, pa.string()),
            }
        )

    changes = updates.union(inserts).map_batches(tag("c"), batch_format="pyarrow")
    from anansi_ray.arrowds import drop_empty_blocks

    out = _stable_t(
        drop_empty_blocks(
            base.map_batches(tag("b"), batch_format="pyarrow")
            .union(changes)
            .groupby("part")
            .map_groups(merge_kernel, batch_format="pyarrow")
            .materialize()
        ).to_pandas(),
        empty,
    ).sort_values("key")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_MERGE_UPSERT = """
WITH latest AS (
  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS bal,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders),
ch AS (
  SELECT o_custkey AS key, bal FROM latest WHERE rn = 1
  UNION ALL
  SELECT o_orderkey + 10000000000,
         CAST(round(o_totalprice * 100) AS BIGINT)
  FROM orders WHERE o_orderkey % 97 = 0),
base AS (
  SELECT c_custkey AS key, CAST(round(c_acctbal * 100) AS BIGINT) AS bal
  FROM customer)
SELECT coalesce(c.key, b.key) AS key,
       coalesce(c.bal, b.bal) AS balance_cents,
       CASE WHEN c.key IS NOT NULL AND b.key IS NOT NULL THEN 'update'
            WHEN c.key IS NOT NULL THEN 'insert'
            ELSE 'keep' END AS action
FROM base b FULL OUTER JOIN ch c ON b.key = c.key
ORDER BY 1
"""


def _vocab_pair_counts(sf_dir: str, V: int):
    """Bounded-vocabulary co-occurrence machinery shared by word_pmi and
    the PPMI-SVD embedding trainer: (n_docs, alphabetically indexed
    vocab_df[token, df], pair-count frame [ia, ib, n_ab] with ia < ib).
    Pass 1 rides the token_df combiner + coarse exchange (top-V cut);
    pass 2 broadcasts the vocab and bincounts within-doc index pairs into
    a V×V partial per batch — every batch forwards ≤ V(V−1)/2 rows."""
    import ray

    from anansi_ray.arrowds import coarse_agg

    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()
    vocab_df = _stable(
        coarse_agg(
            _read(sf_dir, "documents", ["text"]).map_batches(
                ftext.token_df_partial, batch_format="pyarrow"
            ),
            "token",
            {"df": ("sum", "df")},
        )
        .sort(["df", "token"], descending=[True, False])
        .limit(V)
        .to_pandas(),
        {"token": "object", "df": "int64"},
    )
    if len(vocab_df) == 0:
        return n_docs, None, None
    # index vocab ALPHABETICALLY so within-doc index order == pair identity
    # order (tok_a < tok_b) without a per-pair string compare
    vocab_df = vocab_df.sort_values("token").reset_index(drop=True)
    vocab_arr = pa.array(vocab_df["token"].to_numpy(dtype=object), pa.string())
    vocab_ref = ray.put(vocab_arr)

    pair_empty = pa.table(
        {
            "ia": pa.array([], pa.int32()),
            "ib": pa.array([], pa.int32()),
            "n_ab": pa.array([], pa.int64()),
        }
    )

    def pair_partial(b: pa.Table) -> pa.Table:
        voc = ray.get(vocab_ref)
        col = pc.fill_null(b["text"], "")
        toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\W+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        doc = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        hits = pc.index_in(flat, voc)
        m = pc.is_valid(hits).to_numpy(zero_copy_only=False)
        vidx = pc.fill_null(hits, 0).to_numpy(zero_copy_only=False)
        d, v = doc[m], vidx[m].astype(np.int64)
        if len(d) == 0:
            return pair_empty
        # distinct (doc, vocab idx), sorted — strictly increasing v per doc
        key = d * np.int64(V) + v
        key = np.unique(key)
        d, v = key // V, key % V
        counts = np.zeros(V * V, np.int64)
        n = len(d)
        max_m = int(np.bincount(d, minlength=1).max()) if n else 0
        for off in range(1, max_m):
            same = d[: n - off] == d[off:]
            np.add.at(counts, v[: n - off][same] * V + v[off:][same], 1)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "ia": pa.array((nz // V).astype(np.int32), pa.int32()),
                "ib": pa.array((nz % V).astype(np.int32), pa.int32()),
                "n_ab": pa.array(counts[nz], pa.int64()),
            }
        )

    parts = _stable(
        _read(sf_dir, "documents", ["text"])
        .map_batches(pair_partial, batch_format="pyarrow")
        .to_pandas(),
        {"ia": "int32", "ib": "int32", "n_ab": "int64"},
    )
    agg = parts.groupby(["ia", "ib"], as_index=False)["n_ab"].sum()
    return n_docs, vocab_df, agg


def q_word_embedding_knn(sf_dir: str):
    """PPMI-SVD word embeddings (functions/embed_train.py — Levy &
    Goldberg's count-based word2vec twin): the distributed pair-count
    pass (shared _vocab_pair_counts machinery) feeds a rounded V×V PPMI
    matrix whose truncated SVD gives the word vectors; output is the
    cosine top-3 neighbours of the alphabetically-first 5 vocab words —
    a surface invariant under the factorization's sign/rotation
    ambiguity.  Verified vs the sequential twin the oracle builder
    materializes (independent DuckDB pair counts, shared kernels)."""
    from anansi_ray.functions import embed_train as femb

    n_docs, vocab_df, agg = _vocab_pair_counts(sf_dir, 50)
    if vocab_df is None or len(agg) == 0:
        return femb.empty_out()
    M = femb.ppmi_matrix(
        agg["ia"].to_numpy(np.int64),
        agg["ib"].to_numpy(np.int64),
        agg["n_ab"].to_numpy(np.int64),
        vocab_df["df"].to_numpy(np.int64),
        n_docs,
    )
    return femb.svd_neighbors(M, vocab_df["token"].to_numpy(dtype=object))


def q_word_pmi(sf_dir: str):
    """Word-pair PMI over a bounded vocabulary (collocation mining — the
    classic corpus statistic behind phrase detection and feature
    selection): for the corpus's top-50 tokens by document frequency,
    every pair (a < b) co-occurring in ≥ 5 documents with its pointwise
    mutual information ln(n_ab · N / (df_a · df_b)).

    Scale shape (two bounded passes, no pair-level shuffle):
    pass 1 rides the token_df combiner + coarse_agg hash exchange and
    keeps only the top-V vocabulary (V = 50, fixed — the only sort is
    over per-batch vocabularies, never the token stream); pass 2
    broadcasts the alphabetically-indexed vocab, maps each doc's distinct
    tokens to vocab indices block-locally, enumerates within-doc pairs
    with an offset-sweep (≤ V−1 vectorized shifts), and bincounts into a
    V×V partial per batch — every batch forwards ≤ V(V−1)/2 rows, so the
    driver-side finish is O(V²), independent of corpus size.  The vocab
    marginals ARE the pass-1 df values, so no third pass."""
    import ray

    from anansi_ray.arrowds import coarse_agg

    V = 50
    MIN_AB = 5

    empty = pa.table(
        {
            "tok_a": pa.array([], pa.string()),
            "tok_b": pa.array([], pa.string()),
            "n_ab": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64()),
        }
    )

    n_docs, vocab_df, agg = _vocab_pair_counts(sf_dir, V)
    if vocab_df is None or len(agg) == 0:
        return empty
    df_by_idx = vocab_df["df"].to_numpy(np.int64)
    agg = agg[agg["n_ab"] >= MIN_AB]
    if len(agg) == 0:
        return empty

    ia = agg["ia"].to_numpy(np.int64)
    ib = agg["ib"].to_numpy(np.int64)
    n_ab = agg["n_ab"].to_numpy(np.int64)
    pmi = np.round(
        np.log(
            n_ab.astype(np.float64)
            * float(n_docs)
            / (df_by_idx[ia].astype(np.float64) * df_by_idx[ib])
        ),
        6,
    )
    toks = vocab_df["token"].to_numpy(dtype=object)
    out = pa.table(
        {
            "tok_a": pa.array(toks[ia], pa.string()),
            "tok_b": pa.array(toks[ib], pa.string()),
            "n_ab": pa.array(n_ab, pa.int64()),
            "pmi": pa.array(pmi, pa.float64()),
        }
    )
    return out.sort_by([("tok_a", "ascending"), ("tok_b", "ascending")])


def q_langid_confusion(sf_dir: str):
    """Model-evaluation crosstab: confusion matrix of the stopword
    language-ID heuristic against the labeled ``lang`` column — the
    quality gate run before trusting a classifier to route a corpus.
    Integer-exact counts only, so the twin (which re-derives the
    prediction with the SAME CASE-ladder as SQL_LANG_ID) matches
    bit-for-bit.

    Scale shape: prediction + crosstab fuse into ONE streaming pass —
    each batch forwards ≤ |langs|² count rows, the driver combine is
    alphabet-sized."""
    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        pred = ftext.lang_id_batch(b)["lang_pred"].to_pandas()
        true = pc.fill_null(b["lang"], "").to_pandas()
        df = (
            pd.DataFrame({"lang_true": true, "lang_pred": pred})
            .groupby(["lang_true", "lang_pred"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "lang_true": pa.array(
                    df["lang_true"].to_numpy(dtype=object), pa.string()
                ),
                "lang_pred": pa.array(
                    df["lang_pred"].to_numpy(dtype=object), pa.string()
                ),
                "n": pa.array(df["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    parts = _stable(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas(),
        {"lang_true": "object", "lang_pred": "object", "n": "int64"},
    )
    out = (
        parts.groupby(["lang_true", "lang_pred"], as_index=False)["n"]
        .sum()
        .sort_values(["lang_true", "lang_pred"])
    )
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def _sql_langid_confusion() -> str:
    return f"""
WITH pred AS ({_sql_lang_id()}),
j AS (SELECT coalesce(d.lang, '') AS lang_true, p.lang_pred
      FROM documents d JOIN pred p USING (doc_id))
SELECT lang_true, lang_pred, count(*)::BIGINT AS n
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""


SQL_LANGID_CONFUSION = _sql_langid_confusion()


def _daily_revenue(sf_dir: str):
    """Shared combiner: exact daily revenue in cents (catalog-sized)."""
    from ray.data.aggregate import Sum

    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        d = ts_us(b["o_orderdate"]).to_numpy(zero_copy_only=False) // DAY_US
        cents = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        days, inv = np.unique(d, return_inverse=True)
        rev = np.bincount(inv, weights=cents).astype(np.int64)
        return pa.table(
            {
                "dayno": pa.array(days, pa.int64()),
                "rev_cents": pa.array(rev, pa.int64()),
            }
        )

    out = _stable(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("dayno")
        .aggregate(Sum("rev_cents", alias_name="rev_cents"))
        .to_pandas(),
        {"dayno": "int64", "rev_cents": "int64"},
    ).sort_values("dayno")
    return out


def q_revenue_trend_theilsen(sf_dir: str):
    """Robust trend estimation (Theil–Sen): the median of all pairwise
    day-to-day slopes of daily revenue — the outlier-immune alternative
    to least squares (one flash-sale day cannot move it).

    Scale shape: the distributed stage is the same per-batch (day,
    cents) combiner + catalog groupby every daily query rides; the
    O(|days|²) pairwise-slope enumeration then runs on the CATALOG-sized
    day table (thousands of rows even at 100 TB, since the day domain is
    the calendar, not the corpus).  The median is pinned to the
    (n−1)//2 order statistic so both engines pick the same element —
    each slope is one IEEE division, bit-identical across engines."""
    days_df = _daily_revenue(sf_dir)
    d = days_df["dayno"].to_numpy(np.int64)
    r = days_df["rev_cents"].to_numpy(np.int64)
    empty = pa.table(
        {
            "n_pairs": pa.array([], pa.int64()),
            "slope_cents_per_day": pa.array([], pa.float64()),
        }
    )
    if len(d) < 2:
        return empty
    iu = np.triu_indices(len(d), k=1)
    slopes = (r[iu[1]] - r[iu[0]]).astype(np.float64) / (
        d[iu[1]] - d[iu[0]]
    ).astype(np.float64)
    slopes.sort(kind="stable")
    med = slopes[(len(slopes) - 1) // 2]
    return pa.table(
        {
            "n_pairs": pa.array([len(slopes)], pa.int64()),
            "slope_cents_per_day": pa.array([round(float(med), 6)], pa.float64()),
        }
    )


SQL_REVENUE_TREND_THEILSEN = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS dayno,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
           FROM orders GROUP BY 1),
s AS (SELECT (b.rev - a.rev) * 1.0 / (b.dayno - a.dayno) AS slope
      FROM d a JOIN d b ON b.dayno > a.dayno),
r AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
             count(*) OVER () AS n
      FROM s)
SELECT n::BIGINT AS n_pairs, round(slope, 6) AS slope_cents_per_day
FROM r WHERE rn = (n - 1) // 2 + 1
"""


def q_revenue_backtest(sf_dir: str):
    """Forecast backtest (the eval loop of any demand model): a lag-7
    seasonal-naive forecast of daily revenue scored by weekday with
    WMAPE.  Error sums stay integer cents — the single float division
    happens once per weekday row.

    Scale shape: identical to revenue_trend_theilsen — distributed
    (day, cents) combiner + catalog groupby, then the lag join and
    weekday rollup on the calendar-sized day table."""
    days_df = _daily_revenue(sf_dir)
    d = days_df["dayno"].to_numpy(np.int64)
    r = days_df["rev_cents"].to_numpy(np.int64)
    empty = pa.table(
        {
            "weekday": pa.array([], pa.int64()),
            "n_days": pa.array([], pa.int64()),
            "sum_abs_err_cents": pa.array([], pa.int64()),
            "sum_actual_cents": pa.array([], pa.int64()),
            "wmape": pa.array([], pa.float64()),
        }
    )
    if len(d) == 0:
        return empty
    pos = np.searchsorted(d, d - 7)
    pos = np.minimum(pos, len(d) - 1)
    hit = d[pos] == d - 7
    act, fc = r[hit], r[pos][hit]
    wd = d[hit] % 7
    if len(act) == 0:
        return empty
    uniq, inv = np.unique(wd, return_inverse=True)
    n = np.bincount(inv).astype(np.int64)
    abs_err = np.abs(act - fc)
    se = np.zeros(len(uniq), np.int64)
    np.add.at(se, inv, abs_err)
    sa = np.zeros(len(uniq), np.int64)
    np.add.at(sa, inv, act)
    return pa.table(
        {
            "weekday": pa.array(uniq, pa.int64()),
            "n_days": pa.array(n, pa.int64()),
            "sum_abs_err_cents": pa.array(se, pa.int64()),
            "sum_actual_cents": pa.array(sa, pa.int64()),
            "wmape": pa.array(
                np.round(se.astype(np.float64) / sa.astype(np.float64), 6),
                pa.float64(),
            ),
        }
    )


SQL_REVENUE_BACKTEST = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS dayno,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
           FROM orders GROUP BY 1),
j AS (SELECT a.dayno, a.rev AS actual, b.rev AS fcst
      FROM d a JOIN d b ON b.dayno = a.dayno - 7)
SELECT (dayno % 7)::BIGINT AS weekday, count(*)::BIGINT AS n_days,
       sum(abs(actual - fcst))::BIGINT AS sum_abs_err_cents,
       sum(actual)::BIGINT AS sum_actual_cents,
       round(sum(abs(actual - fcst)) * 1.0 / sum(actual), 6) AS wmape
FROM j GROUP BY 1 ORDER BY 1
"""


def q_redirect_aliases(sf_dir: str):
    """Redirect-chain alias resolution over the synthetic web (the crawl
    dedup step that collapses 301/302 alias URLs onto their canonical
    target): for every redirecting URL, follow the chain up to 10 hops
    and report the terminal target and hop count.

    Scale shape: the redirect map (3xx rows only — a small fraction of
    the web) broadcasts once via ``ray.put`` as a sorted key/target pair
    and each batch resolves its chains with ≤9 vectorized searchsorted
    sweeps over only its still-active rows; at a 10^10 frontier where
    the 3xx subset outgrows the broadcast envelope, the hop becomes the
    frontier-only hash-exchange join of functions/graph.py khop_reach —
    same per-hop volume, one exchange per hop.  Twin = recursive CTE
    with the identical 10-hop cap."""
    import ray

    from anansi_ray import fixtures

    web = fixtures.generate("tiny", seed=42)["web"]
    sel = web.select(["url", "redirect"])
    red = pc.fill_null(sel["redirect"], "").to_pandas().to_numpy(dtype=object)
    urls = sel["url"].to_pandas().to_numpy(dtype=object)
    has = np.array([len(r) > 0 for r in red], bool)
    keys = urls[has]
    tgts = red[has]
    order = np.argsort(keys)
    map_ref = ray.put((keys[order], tgts[order]))

    def resolve(b: pa.Table) -> pa.Table:
        k, t = ray.get(map_ref)
        src = b["url"].to_pandas().to_numpy(dtype=object)
        first = pc.fill_null(b["redirect"], "").to_pandas().to_numpy(dtype=object)
        m = np.array([len(r) > 0 for r in first], bool)
        src, cur = src[m], first[m]
        d = np.ones(len(src), np.int64)
        active = np.ones(len(src), bool)
        for _ in range(9):
            if not active.any():
                break
            c = cur[active]
            pos = np.searchsorted(k, c)
            pos = np.minimum(pos, max(len(k) - 1, 0))
            hit = (k[pos] == c) if len(k) else np.zeros(len(c), bool)
            nxt = np.where(hit, t[pos] if len(k) else c, c)
            idx = np.flatnonzero(active)
            cur[idx[hit]] = nxt[hit]
            d[idx[hit]] += 1
            active[idx[~hit]] = False
        return pa.table(
            {
                "url": pa.array(src, pa.string()),
                "canonical": pa.array(cur, pa.string()),
                "n_hops": pa.array(d, pa.int64()),
            }
        )

    out = _stable(
        rd.from_arrow(sel)
        .map_batches(resolve, batch_format="pyarrow")
        .to_pandas(),
        {"url": "object", "canonical": "object", "n_hops": "int64"},
    ).sort_values("url")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_REDIRECT_ALIASES = f"""
WITH RECURSIVE chain(src, cur, d) AS (
  SELECT url, redirect, 1
  FROM read_parquet('{ORACLE_DIR}/web_redirects.parquet')
  WHERE redirect IS NOT NULL AND redirect <> ''
  UNION ALL
  SELECT c.src, w.redirect, c.d + 1
  FROM chain c
  JOIN read_parquet('{ORACLE_DIR}/web_redirects.parquet') w
    ON w.url = c.cur
  WHERE w.redirect IS NOT NULL AND w.redirect <> '' AND c.d < 10)
SELECT src AS url, cur AS canonical, d::BIGINT AS n_hops
FROM chain
QUALIFY row_number() OVER (PARTITION BY src ORDER BY d DESC) = 1
ORDER BY 1
"""


def q_diversified_topk(sf_dir: str):
    """Diversity-constrained global top-k (the corpus-sampling rule
    "best 50 documents but at most 2 per source", preventing one hub
    domain from filling the whole budget).

    Scale shape: the per-source cap makes the partial ASSOCIATIVE — the
    per-source top-2 of a union equals the per-source top-2 over each
    batch's per-source top-2 — so every batch forwards ≤ 2·|its sources|
    rows and the driver finish re-caps and takes the global 50.  No
    shuffle at all; ties break by (n_chars DESC, doc_id ASC) on both
    engines."""
    K = 50
    CAP = 2

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
                "source": pc.fill_null(b["source"], "")
                .to_pandas()
                .to_numpy(dtype=object),
                "n_chars": b["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        df = df.sort_values(
            ["source", "n_chars", "doc_id"], ascending=[True, False, True]
        )
        keep = df.groupby("source", sort=False).head(CAP)
        return pa.Table.from_pandas(keep, preserve_index=False)

    parts = _stable(
        _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas(),
        {"doc_id": "int64", "source": "object", "n_chars": "int64"},
    )
    parts = parts.sort_values(
        ["source", "n_chars", "doc_id"], ascending=[True, False, True]
    )
    capped = parts.groupby("source", sort=False).head(CAP)
    out = capped.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(
        K
    )[["doc_id", "source", "n_chars"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_DIVERSIFIED_TOPK = """
WITH r AS (SELECT doc_id, coalesce(source, '') AS source, n_chars,
                  row_number() OVER (PARTITION BY coalesce(source, '')
                                     ORDER BY n_chars DESC, doc_id) AS rn
           FROM documents)
SELECT doc_id, source, n_chars
FROM r WHERE rn <= 2
ORDER BY n_chars DESC, doc_id LIMIT 50
"""


def q_media_payload_dedup(sf_dir: str):
    """Exact media dedup by content hash over the crawl's interleaved
    output (the image/audio analogue of dedup_exact — identical payloads
    referenced from many documents collapse to one keeper): one row per
    distinct payload with its reference count, distinct-document count,
    byte size and the lexicographically-first (doc, ref) keeper.

    Scale shape: payloads NEVER shuffle — each batch hashes its payload
    bytes block-locally and forwards only (md5, keeper, bytes, doc-flag)
    rows; ONE coarse_agg hash exchange on the 128-bit content key does
    count/sum/min in-kernel.  The per-batch (md5, doc) first-occurrence
    flag makes the distinct-doc count a plain SUM because a document's
    spans never split across batches."""
    import hashlib

    from anansi_ray.arrowds import coarse_agg
    from anansi_ray.functions.spans import flatten_spans_batch

    docs = _crawl_results()["documents"]
    flat = flatten_spans_batch(docs)

    def explode_hash(batch: pa.Table) -> pa.Table:
        md5s, keepers, sizes, flags = [], [], [], []
        seen: set = set()
        for d, rs in zip(
            batch["doc_id"].to_pylist(), batch["media_refs"].to_pylist()
        ):
            for r in rs or ():
                payload = ("media:" + r) * (len(r) % 5 + 1)
                h = hashlib.md5(payload.encode()).hexdigest()
                md5s.append(h)
                keepers.append(f"{d}|{r}")
                sizes.append(len(payload))
                flags.append(1 if (h, d) not in seen else 0)
                seen.add((h, d))
        return pa.table(
            {
                "payload_md5": pa.array(md5s, pa.string()),
                "keeper": pa.array(keepers, pa.string()),
                "payload_bytes": pa.array(sizes, pa.int64()),
                "docflag": pa.array(flags, pa.int64()),
            }
        )

    media = rd.from_arrow(flat.select(["doc_id", "media_refs"])).map_batches(
        explode_hash, batch_format="pyarrow"
    )
    out = _stable(
        coarse_agg(
            media,
            "payload_md5",
            {
                "n_refs": ("count", "payload_md5"),
                "n_docs": ("sum", "docflag"),
                "payload_bytes": ("min", "payload_bytes"),
                "keeper": ("min", "keeper"),
            },
        ).to_pandas(),
        {
            "payload_md5": "object",
            "n_refs": "int64",
            "n_docs": "int64",
            "payload_bytes": "int64",
            "keeper": "object",
        },
    ).sort_values("payload_md5")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def q_source_kl_divergence(sf_dir: str):
    """Domain-shift detector: per-source KL divergence of the source's
    token distribution from the corpus distribution, both restricted to
    (and renormalized over) the corpus's top-50 tokens by term count —
    the drift statistic a corpus-mixture pipeline watches when a new
    crawl shard arrives.

    Scale shape: pass 1 = term-count combiner → coarse_agg hash exchange
    → fixed top-V vocabulary (the only sort is over per-batch vocabs);
    pass 2 maps tokens to broadcast vocab indices block-locally and
    pre-counts (source, idx) per batch; ONE coarse exchange on (source,
    idx) collapses the counts, a second source-hash exchange computes
    each source's 50-term KL in-kernel.  Shuffle volume is bounded by
    |sources|·V, never the token stream."""
    import ray

    from anansi_ray.arrowds import coarse_agg, drop_empty_blocks

    V = 50
    P = 32

    empty = pa.table(
        {
            "source": pa.array([], pa.string()),
            "n_vocab_tokens": pa.array([], pa.int64()),
            "kl": pa.array([], pa.float64()),
        }
    )

    def term_partial(b: pa.Table) -> pa.Table:
        col = pc.fill_null(b["text"], "")
        toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\W+")
        flat = pc.list_flatten(toks)
        s = flat.to_pandas()
        s = s[s.str.len() > 0]
        cnt = s.value_counts()
        return pa.table(
            {
                "token": pa.array(cnt.index.to_numpy(dtype=object), pa.string()),
                "c": pa.array(cnt.to_numpy(np.int64), pa.int64()),
            }
        )

    vocab_df = _stable(
        coarse_agg(
            _read(sf_dir, "documents", ["text"]).map_batches(
                term_partial, batch_format="pyarrow"
            ),
            "token",
            {"c": ("sum", "c")},
        )
        .sort(["c", "token"], descending=[True, False])
        .limit(V)
        .to_pandas(),
        {"token": "object", "c": "int64"},
    )
    if len(vocab_df) == 0:
        return empty
    vocab_df = vocab_df.sort_values("token").reset_index(drop=True)
    vocab_arr = pa.array(vocab_df["token"].to_numpy(dtype=object), pa.string())
    gc = vocab_df["c"].to_numpy(np.int64)
    pg = gc.astype(np.float64) / float(gc.sum())
    bcast = ray.put((vocab_arr, pg))

    def src_counts(b: pa.Table) -> pa.Table:
        import pandas as pd

        voc, _ = ray.get(bcast)
        col = pc.fill_null(b["text"], "")
        src = pc.fill_null(b["source"], "").to_pandas().to_numpy(dtype=object)
        toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\W+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        doc = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        hits = pc.index_in(flat, voc)
        m = pc.is_valid(hits).to_numpy(zero_copy_only=False)
        idx = pc.fill_null(hits, 0).to_numpy(zero_copy_only=False)[m].astype(
            np.int64
        )
        ssrc = src[doc[m]]
        df = (
            pd.DataFrame({"source": ssrc, "idx": idx})
            .groupby(["source", "idx"], sort=False)
            .size()
            .reset_index(name="cs")
        )
        return pa.table(
            {
                "source": pa.array(df["source"].to_numpy(dtype=object), pa.string()),
                "idx": pa.array(df["idx"].to_numpy(np.int64), pa.int64()),
                "cs": pa.array(df["cs"].to_numpy(np.int64), pa.int64()),
            }
        )

    counts = coarse_agg(
        _read(sf_dir, "documents", ["text", "source"]).map_batches(
            src_counts, batch_format="pyarrow"
        ),
        ["source", "idx"],
        {"cs": ("sum", "cs")},
    )

    def tag_src(b: pa.Table) -> pa.Table:
        import pandas as pd

        h = pd.util.hash_array(b["source"].to_pandas().to_numpy(dtype=object))
        return b.append_column(
            "spart", pa.array((h % P).astype(np.int32), pa.int32())
        )

    def kl_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        _, pgv = ray.get(bcast)
        pdf = g.to_pandas().sort_values(["source", "idx"], kind="stable")
        src = pdf["source"].to_numpy(dtype=object)
        idx = pdf["idx"].to_numpy(np.int64)
        cs = pdf["cs"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        sizes = np.diff(np.r_[starts, len(src)])
        tot = np.add.reduceat(cs, starts).astype(np.float64)
        ps = cs.astype(np.float64) / np.repeat(tot, sizes)
        terms = ps * np.log(ps / pgv[idx])
        kl = np.add.reduceat(terms, starts)
        return pa.table(
            {
                "source": pa.array(src[starts], pa.string()),
                "n_vocab_tokens": pa.array(
                    np.add.reduceat(cs, starts).astype(np.int64), pa.int64()
                ),
                "kl": pa.array(np.round(kl, 6), pa.float64()),
            }
        )

    out = _stable(
        drop_empty_blocks(
            counts.map_batches(tag_src, batch_format="pyarrow")
            .groupby("spart")
            .map_groups(kl_kernel, batch_format="pyarrow")
            .materialize()
        ).to_pandas(),
        {"source": "object", "n_vocab_tokens": "int64", "kl": "float64"},
    ).sort_values("source")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_SOURCE_KL_DIVERGENCE = r"""
WITH tok AS (SELECT coalesce(source, '') AS source,
                    unnest(regexp_extract_all(lower(coalesce(text, '')),
                                              '\w+')) AS t
             FROM documents),
cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
vocab AS (SELECT t, c FROM cnt ORDER BY c DESC, t LIMIT 50),
gtot AS (SELECT sum(c) AS g FROM vocab),
sc AS (SELECT source, t, count(*) AS cs FROM tok
       WHERE t IN (SELECT t FROM vocab) GROUP BY 1, 2),
stot AS (SELECT source, sum(cs) AS s FROM sc GROUP BY 1)
SELECT sc.source, stot.s::BIGINT AS n_vocab_tokens,
       round(sum((sc.cs * 1.0 / stot.s)
                 * ln((sc.cs * 1.0 / stot.s) / (v.c * 1.0 / gtot.g))), 6)
         AS kl
FROM sc
JOIN vocab v ON v.t = sc.t
JOIN stot ON stot.source = sc.source
CROSS JOIN gtot
GROUP BY 1, 2 ORDER BY 1
"""


def q_link_degree_stats(sf_dir: str):
    """Degree distribution of the synthesized link graph (the first
    diagnostic run on any web graph — spotting hubs and the power-law
    tail): one row per distinct degree with its vertex count.

    Scale shape: edges normalize u<v and dedup block-locally, ONE (u,v)
    groupby dedups globally (same plan as link_triangles), per-batch
    endpoint-count partials ride coarse_agg on the vertex id, and the
    degree histogram is a second coarse_agg on the (tiny) degree
    domain."""
    from anansi_ray.arrowds import coarse_agg

    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()
    if n == 0:
        return pa.table(
            {
                "degree": pa.array([], pa.int64()),
                "n_vertices": pa.array([], pa.int64()),
            }
        )

    def edges(b: pa.Table) -> pa.Table:
        i = b["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        x = np.concatenate([i, i, i])
        y = np.concatenate([(i + 1) % n, (i + 2) % n, (3 * i + 7) % n])
        u, v = np.minimum(x, y), np.maximum(x, y)
        keep = u != v
        u, v = u[keep], v[keep]
        key = np.unique(u * np.int64(n + 1) + v)
        return pa.table(
            {
                "u": pa.array(key // (n + 1), pa.int64()),
                "v": pa.array(key % (n + 1), pa.int64()),
            }
        )

    edge_ds = (
        docs.map_batches(edges, batch_format="pyarrow")
        .groupby(["u", "v"])
        .count()
    )

    def endpoint_partial(b: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                b["u"].to_numpy(zero_copy_only=False),
                b["v"].to_numpy(zero_copy_only=False),
            ]
        )
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(uniq, pa.int64()),
                "d": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    deg = coarse_agg(
        edge_ds.map_batches(endpoint_partial, batch_format="pyarrow"),
        "node",
        {"degree": ("sum", "d")},
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        d = b["degree"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {
                "degree": pa.array(uniq, pa.int64()),
                "n_vertices": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    out = _stable(
        coarse_agg(
            deg.map_batches(hist_partial, batch_format="pyarrow"),
            "degree",
            {"n_vertices": ("sum", "n_vertices")},
        ).to_pandas(),
        {"degree": "int64", "n_vertices": "int64"},
    ).sort_values("degree")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_LINK_DEGREE_STATS = """
WITH nn AS (SELECT count(*) AS n FROM documents),
raw AS (
  SELECT doc_id AS x, (doc_id + 1) % n AS y FROM documents, nn
  UNION ALL SELECT doc_id, (doc_id + 2) % n FROM documents, nn
  UNION ALL SELECT doc_id, (3 * doc_id + 7) % n FROM documents, nn
),
e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
      FROM raw WHERE x <> y),
deg AS (SELECT node, count(*) AS degree FROM (
          SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        GROUP BY 1)
SELECT degree::BIGINT AS degree, count(*)::BIGINT AS n_vertices
FROM deg GROUP BY 1 ORDER BY 1
"""


def q_user_value_ewma(sf_dir: str):
    """Time-decayed per-user feature (the recency-weighted engagement
    score feature stores compute): decayed_value = Σ value·2^(−k) where
    k counts events BACK from the user's latest (k=0 = most recent).
    The decay base is 1/2, so every weight is an exact power of two
    (``np.ldexp``) and the weighted terms are bit-identical on both
    engines — only the final summation order differs, absorbed by
    round(6).

    Scale shape: ONE user-hash exchange; the partition kernel lexsorts
    by (user, ts, id), derives k from segment positions, and reduces
    each user with ``np.add.reduceat`` — no per-user Python, no global
    sort."""
    P = 32

    def tag(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((u % P).astype(np.int32), pa.int32()),
                "user_id": b["user_id"],
                "t": ts_us(b["ts"]),
                "event_id": b["event_id"],
                "value": b["value"],
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "decayed_value": pa.array([], pa.float64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        u = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        e = g["event_id"].to_numpy(zero_copy_only=False)
        v = g["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        sizes = np.diff(np.r_[starts, len(u)])
        ends = starts + sizes
        # k = distance back from the segment's LAST event (exact 2^-k)
        k = (np.repeat(ends, sizes) - 1 - np.arange(len(u))).astype(np.int64)
        w = np.ldexp(1.0, -np.minimum(k, 1074))
        dec = np.add.reduceat(v * w, starts)
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "n_events": pa.array(sizes.astype(np.int64), pa.int64()),
                "decayed_value": pa.array(dec, pa.float64()),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    out = _stable(
        drop_empty_blocks(
            _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(kernel, batch_format="pyarrow")
            .materialize()
        ).to_pandas(),
        {"user_id": "int64", "n_events": "int64", "decayed_value": "float64"},
    ).sort_values("user_id")
    out["decayed_value"] = out["decayed_value"].round(6)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_USER_VALUE_EWMA = """
WITH r AS (SELECT user_id, value,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) - 1
                    AS k
           FROM events)
SELECT user_id, count(*)::BIGINT AS n_events,
       round(sum(value * pow(0.5, k)), 6) AS decayed_value
FROM r GROUP BY 1 ORDER BY 1
"""


def q_path_trigrams(sf_dir: str):
    """Sequential pattern mining: the 25 most common 3-step event-type
    paths (consecutive triples in each user's timeline) — the funnel-
    discovery primitive, one step richer than the Markov pair matrix
    (event_transitions).

    Scale shape: ONE user-hash exchange; the partition kernel lexsorts by
    (user, ts, id), forms trigrams with two same-user shifts (pure
    slicing), and pre-counts paths before the tiny |types|³-keyed
    driver rollup — the shuffle carries events once, path counts are
    bounded by the cubed type alphabet, not the corpus."""
    P = 32

    def tag(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((u % P).astype(np.int32), pa.int32()),
                "user_id": b["user_id"],
                "t": ts_us(b["ts"]),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
            }
        )

    empty = pa.table(
        {"path": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows < 3:
            return empty
        u = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        e = g["event_id"].to_numpy(zero_copy_only=False)
        ty = g["event_type"].to_pandas().to_numpy(dtype=object)
        order = np.lexsort((e, t, u))
        u, ty = u[order], ty[order]
        same2 = u[:-2] == u[2:]
        a, b2, c = ty[:-2][same2], ty[1:-1][same2], ty[2:][same2]
        if len(a) == 0:
            return empty
        import pandas as pd

        paths = pd.Series(a) + ">" + pd.Series(b2) + ">" + pd.Series(c)
        cnt = paths.value_counts()
        return pa.table(
            {
                "path": pa.array(cnt.index.to_numpy(dtype=object), pa.string()),
                "n": pa.array(cnt.to_numpy(np.int64), pa.int64()),
            }
        )

    from anansi_ray.arrowds import drop_empty_blocks

    parts = _stable(
        drop_empty_blocks(
            _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(kernel, batch_format="pyarrow")
            .materialize()
        ).to_pandas(),
        {"path": "object", "n": "int64"},
    )
    out = parts.groupby("path", as_index=False)["n"].sum()
    out = out.sort_values(["n", "path"], ascending=[False, True]).head(25)
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_PATH_TRIGRAMS = """
WITH s AS (SELECT user_id, event_type,
                  lead(event_type, 1) OVER w AS t2,
                  lead(event_type, 2) OVER w AS t3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
p AS (SELECT event_type || '>' || t2 || '>' || t3 AS path
      FROM s WHERE t3 IS NOT NULL)
SELECT path, count(*)::BIGINT AS n
FROM p GROUP BY 1 ORDER BY n DESC, path LIMIT 25
"""


def q_embedding_gram(sf_dir: str):
    """Distributed Gram matrix of the embedding corpus (the PCA /
    whitening building block): G[i,j] = Σ over vectors of xᵢ·xⱼ, upper
    triangle.  Each batch reduces its vectors to ONE d×d partial via a
    single ``X.T @ X`` matmul — the driver combine sees #batches × d(d+1)/2
    rows, never a vector; float summation-order noise is absorbed by
    round(4) exactly as embedding_stats does."""
    def partial(b: pa.Table) -> pa.Table:
        m = np.vstack(b["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        g = m.T @ m
        d = g.shape[0]
        iu = np.triu_indices(d)
        return pa.table(
            {
                "dim_i": pa.array(iu[0].astype(np.int64) + 1, pa.int64()),
                "dim_j": pa.array(iu[1].astype(np.int64) + 1, pa.int64()),
                "gram": pa.array(g[iu], pa.float64()),
            }
        )

    parts = _stable(
        _read(sf_dir, "embeddings", ["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas(),
        {"dim_i": "int64", "dim_j": "int64", "gram": "float64"},
    )
    out = (
        parts.groupby(["dim_i", "dim_j"], as_index=False)["gram"]
        .sum()
        .sort_values(["dim_i", "dim_j"])
    )
    out["gram"] = out["gram"].round(4)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_EMBEDDING_GRAM = """
WITH ex AS (SELECT vec_id, generate_subscripts(embedding, 1)::BIGINT AS dim,
                   unnest(embedding)::DOUBLE AS x
            FROM embeddings)
SELECT a.dim AS dim_i, b.dim AS dim_j, round(sum(a.x * b.x), 4) AS gram
FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_shingle_overlap_join(sf_dir: str):
    """EXACT containment join (overlap coefficient ≥ 0.8 over 3-token
    shingle sets): finds a short document quoted/embedded inside a longer
    one — pairs Jaccard-based dedup structurally misses because the long
    side's size dilutes the union.  Same PPJoin machinery as
    shingle_jaccard_join with the asymmetric prefix lemma: only the
    SMALLER side is pigeonholed, so candidates pair prefix rows against
    all co-bucketed rows of equal-or-larger docs (no size-ratio prune
    exists for containment).  functions/dedup.py shingle_jaccard_pairs
    (sim="overlap")."""
    out = fdedup.shingle_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        t_num=8,
        t_den=10,
        sim="overlap",
        stamped=_shingle_stamped_ds(sf_dir),
    )
    if out is None:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "overlap": pa.array([], pa.float64()),
            }
        )
    return out


SQL_SHINGLE_OVERLAP_JOIN = r"""
WITH w AS (SELECT doc_id,
                  regexp_extract_all(lower(coalesce(text, '')), '\w+') AS ws
           FROM documents),
g AS (SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
i AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
      FROM g x JOIN g y ON x.sh = y.sh AND x.doc_id < y.doc_id
      GROUP BY 1, 2)
SELECT i.a, i.b,
       round(inter * 1.0 / least(sa.n, sb.n), 6) AS overlap
FROM i JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b
WHERE inter * 10 >= 8 * least(sa.n, sb.n)
ORDER BY 1, 2
"""


def q_embedding_quantize(sf_dir: str):
    """Scalar (int8-style) embedding quantization — the storage/ANN-memory
    step: per-dimension [min, max] codebook learned in one pass, then
    every value mapped to floor((x − min)/(max − min)·255).  Output: the
    per-dim codebook plus the integer-exact sum of assigned codes (the
    oracle-checkable fingerprint of the whole quantized matrix — a value
    compare over n·d codes without shipping them).

    Scale shape (two streaming passes, zero shuffle): pass 1 reduces each
    batch to a dim-row (min, max) partial; the driver combines #batches ×
    dim rows into the codebook and broadcasts it via ``ray.put``; pass 2
    quantizes block-locally in float64 (identical IEEE ops to the SQL
    twin — min/max carry no arithmetic, so both sides see bit-equal
    inputs and ``floor`` is rounding-mode-free) and emits a dim-row
    (Σcode, n) partial."""
    import ray

    empty = pa.table(
        {
            "dim": pa.array([], pa.int64()),
            "dmin": pa.array([], pa.float64()),
            "dmax": pa.array([], pa.float64()),
            "sum_q": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def mm_partial(b: pa.Table) -> pa.Table:
        m = np.vstack(b["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        return pa.table(
            {
                "dim": pa.array(np.arange(1, m.shape[1] + 1), pa.int64()),
                "dmin": pa.array(m.min(axis=0), pa.float64()),
                "dmax": pa.array(m.max(axis=0), pa.float64()),
            }
        )

    mm = _stable(
        _read(sf_dir, "embeddings", ["embedding"])
        .map_batches(mm_partial, batch_format="pyarrow")
        .to_pandas(),
        {"dim": "int64", "dmin": "float64", "dmax": "float64"},
    )
    if len(mm) == 0:
        return empty
    book = (
        mm.groupby("dim", sort=True)
        .agg(dmin=("dmin", "min"), dmax=("dmax", "max"))
        .reset_index()
    )
    dmin = book["dmin"].to_numpy(np.float64)
    dmax = book["dmax"].to_numpy(np.float64)
    book_ref = ray.put((dmin, dmax))

    def q_partial(b: pa.Table) -> pa.Table:
        lo, hi = ray.get(book_ref)
        m = np.vstack(b["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        rng = hi - lo
        qv = np.floor((m - lo) / np.where(rng > 0, rng, 1.0) * 255.0)
        qv = np.where(rng > 0, qv, 0.0).astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(np.arange(1, m.shape[1] + 1), pa.int64()),
                "sum_q": pa.array(qv.sum(axis=0), pa.int64()),
                "n": pa.array(
                    np.full(m.shape[1], m.shape[0], dtype=np.int64), pa.int64()
                ),
            }
        )

    parts = _stable(
        _read(sf_dir, "embeddings", ["embedding"])
        .map_batches(q_partial, batch_format="pyarrow")
        .to_pandas(),
        {"dim": "int64", "sum_q": "int64", "n": "int64"},
    )
    agg = (
        parts.groupby("dim", sort=True)
        .agg(sum_q=("sum_q", "sum"), n=("n", "sum"))
        .reset_index()
    )
    out = book.merge(agg, on="dim")
    out["dmin"] = out["dmin"].round(6)
    out["dmax"] = out["dmax"].round(6)
    return pa.Table.from_pandas(
        out[["dim", "dmin", "dmax", "sum_q", "n"]], preserve_index=False
    )


SQL_EMBEDDING_QUANTIZE = """
WITH ex AS (SELECT unnest(embedding)::DOUBLE AS x,
                   generate_subscripts(embedding, 1)::BIGINT AS dim
            FROM embeddings),
mm AS (SELECT dim, min(x) AS dmin, max(x) AS dmax FROM ex GROUP BY 1),
q AS (SELECT ex.dim,
             CASE WHEN mm.dmax > mm.dmin
                  THEN floor((ex.x - mm.dmin) / (mm.dmax - mm.dmin) * 255)
                  ELSE 0 END AS qv
      FROM ex JOIN mm USING (dim))
SELECT mm.dim, round(mm.dmin, 6) AS dmin, round(mm.dmax, 6) AS dmax,
       sum(q.qv)::BIGINT AS sum_q, count(*)::BIGINT AS n
FROM q JOIN mm USING (dim)
GROUP BY 1, 2, 3 ORDER BY 1
"""


def q_events_watermark(sf_dir: str):
    """Streaming late-data accounting under a global ingest watermark
    (Flink/Beam bounded-disorder semantics): events arrive with a
    deterministic per-event network delay (0–2 h, a hash of event_id);
    the watermark is the max event time seen over all STRICTLY earlier
    arrivals, and an event is LATE (dropped by a 1-hour
    allowed-lateness rule) if its own time lags the watermark by more
    than D.  Output: kept/dropped counts and worst observed lateness per
    event type.

    Scale shape: the watermark is an exclusive running max over the
    arrival order — functions/scan.py ordered_watermark, the same
    3-pass equal-count-range scan as the running total (max is
    associative): boundaries on the arrival hour, per-part max partials
    exclusive-max-scanned on the driver, ONE coarse exchange with a
    block-local ``np.maximum.accumulate``.  The final per-type rollup is
    a ≤|types|-row partial per batch."""
    D_US = 3_600_000_000
    HOUR_US = 3_600_000_000

    from anansi_ray.functions.scan import ordered_watermark

    def prep(b: pa.Table) -> pa.Table:
        t = ts_us(b["ts"]).to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        # (eid * 2654435761) % 7200 computed modularly so it never
        # overflows int64 at any event_id scale (the SQL twin multiplies
        # directly — BIGINT-safe there up to ~3.5e9 events)
        delay = ((eid % 7200) * (2654435761 % 7200)) % 7200
        at = t + delay * 1_000_000
        return pa.table(
            {
                "event_type": b["event_type"],
                "event_id": b["event_id"],
                "t": pa.array(t, pa.int64()),
                "at": pa.array(at, pa.int64()),
                "at_hour": pa.array(at // HOUR_US, pa.int64()),
            }
        )

    wm = ordered_watermark(
        _read(sf_dir, "events", ["event_id", "ts", "event_type"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        range_col="at_hour",
        order_cols=["at", "event_id"],
        ts_col="t",
        keep_cols=["event_type", "t"],
    )

    def rollup(b: pa.Table) -> pa.Table:
        import pandas as pd

        t = b["t"].to_numpy(zero_copy_only=False)
        hi = b["wm_hi"].to_numpy(zero_copy_only=False)
        valid = b["wm_valid"].to_numpy(zero_copy_only=False)
        late = valid & (t < hi - D_US)
        amt = np.where(late, hi - t, 0)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pandas(),
                "kept": (~late).astype(np.int64),
                "dropped": late.astype(np.int64),
                "amt": amt,
            }
        )
        g = df.groupby("event_type", as_index=False).agg(
            n_kept=("kept", "sum"),
            n_dropped=("dropped", "sum"),
            max_late_us=("amt", "max"),
        )
        return pa.table(
            {
                "event_type": pa.array(
                    g["event_type"].to_numpy(dtype=object), pa.string()
                ),
                "n_kept": pa.array(g["n_kept"].to_numpy(np.int64), pa.int64()),
                "n_dropped": pa.array(
                    g["n_dropped"].to_numpy(np.int64), pa.int64()
                ),
                "max_late_us": pa.array(
                    g["max_late_us"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    parts = _stable(
        wm.map_batches(rollup, batch_format="pyarrow").to_pandas(),
        {
            "event_type": "object",
            "n_kept": "int64",
            "n_dropped": "int64",
            "max_late_us": "int64",
        },
    )
    out = parts.groupby("event_type", as_index=False).agg(
        n_kept=("n_kept", "sum"),
        n_dropped=("n_dropped", "sum"),
        max_late_us=("max_late_us", "max"),
    )
    out["max_late_us"] = out["max_late_us"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("event_type").reset_index(drop=True),
        preserve_index=False,
    )


SQL_EVENTS_WATERMARK = """
WITH a AS (SELECT event_type, epoch_us(ts) AS t, event_id,
                  epoch_us(ts) + ((event_id * 2654435761) % 7200) * 1000000
                    AS at
           FROM events),
w AS (SELECT event_type, t,
             max(t) OVER (ORDER BY at, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hi
      FROM a)
SELECT event_type,
       (count(*) FILTER (hi IS NULL OR t >= hi - 3600000000))::BIGINT
         AS n_kept,
       (count(*) FILTER (hi IS NOT NULL AND t < hi - 3600000000))::BIGINT
         AS n_dropped,
       coalesce(max(CASE WHEN hi IS NOT NULL AND t < hi - 3600000000
                         THEN hi - t END), 0)::BIGINT AS max_late_us
FROM w GROUP BY 1 ORDER BY 1
"""


def q_leakage_split_audit(sf_dir: str):
    """Group-safe train/validation split with a cross-split leakage audit
    (the step every training-data pipeline runs before handing a corpus
    to a trainer): documents are assigned to 'train'/'val' by a
    deterministic hash of their SOURCE (domain-level split — near-dup
    pages from one site can never straddle the boundary), and the audit
    counts exact-text collisions that still cross it (identical pages
    syndicated across domains).

    Scale shape: the split is a pure per-row function (md5 over each
    batch's few DISTINCT sources, mapped back via ``pc.index_in`` —
    never per row); per-split doc/char totals are 2-row partials per
    batch; distinct-source counts ride coarse_agg on source; the leak
    audit dedupes (text-hash, split) per batch, exchanges ONCE on a
    64-bit text hash, and counts hashes holding both splits with a
    run-length kernel — the shuffle carries one row per distinct
    (text, split) per batch, never text payloads."""
    import hashlib

    from anansi_ray.arrowds import coarse_agg, drop_empty_blocks

    P = 32

    def _split_of(sources: np.ndarray) -> np.ndarray:
        # md5(source) first 8 hex chars as uint32 % 10 — mirrors the SQL
        # twin's ('0x' || substr(md5(source),1,8))::UINTEGER % 10
        buckets = np.empty(len(sources), np.int64)
        for i, s in enumerate(sources):
            buckets[i] = (
                int.from_bytes(
                    hashlib.md5(str(s).encode()).digest()[:4], "big"
                )
                % 10
            )
        return np.where(buckets < 8, "train", "val")

    def _row_splits(b: pa.Table) -> np.ndarray:
        src = pc.fill_null(b["source"], "").to_pandas().to_numpy(dtype=object)
        uniq, inv = np.unique(src, return_inverse=True)
        return _split_of(uniq)[inv]

    def stats_partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        sp = _row_splits(b)
        nch = b["n_chars"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"split": sp, "n": 1, "nch": nch})
        g = df.groupby("split", as_index=False).agg(
            n_docs=("n", "sum"), n_chars_sum=("nch", "sum")
        )
        return pa.table(
            {
                "split": pa.array(g["split"].to_numpy(dtype=object), pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(np.int64), pa.int64()),
                "n_chars_sum": pa.array(
                    g["n_chars_sum"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    def src_partial(b: pa.Table) -> pa.Table:
        src = pc.fill_null(b["source"], "").to_pandas().to_numpy(dtype=object)
        uniq = np.unique(src)
        return pa.table({"source": pa.array(uniq, pa.string())})

    def src_split_counts(b: pa.Table) -> pa.Table:
        src = b["source"].to_pandas().to_numpy(dtype=object)
        sp = _split_of(src)
        uniq, cnt = np.unique(sp, return_counts=True)
        return pa.table(
            {
                "split": pa.array(uniq, pa.string()),
                "n_sources": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def leak_partial(b: pa.Table) -> pa.Table:
        sp = _row_splits(b)
        txt = pc.fill_null(b["text"], "").to_pandas().to_numpy(dtype=object)
        md5 = hashlib.md5
        h = np.fromiter(
            (
                int.from_bytes(md5(str(t).encode()).digest()[:8], "big") >> 4
                for t in txt
            ),
            dtype=np.int64,
            count=len(txt),
        )
        key = np.unique(h * 2 + (sp == "val"))
        hh = key >> 1
        return pa.table(
            {
                "part": pa.array((hh % P).astype(np.int32), pa.int32()),
                "h": pa.array(hh, pa.int64()),
                "sbit": pa.array((key & 1).astype(np.int8), pa.int8()),
            }
        )

    leak_empty = pa.table({"n": pa.array([], pa.int64())})

    def leak_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return leak_empty
        h = g["h"].to_numpy(zero_copy_only=False)
        sb = g["sbit"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.unique(h * 2 + sb)
        hh = key >> 1
        starts = np.flatnonzero(np.r_[True, hh[1:] != hh[:-1]])
        sizes = np.diff(np.r_[starts, len(hh)])
        return pa.table({"n": pa.array([int((sizes == 2).sum())], pa.int64())})

    docs = _read(sf_dir, "documents", ["text", "source", "n_chars"])
    stats = _stable(
        docs.map_batches(stats_partial, batch_format="pyarrow").to_pandas(),
        {"split": "object", "n_docs": "int64", "n_chars_sum": "int64"},
    )
    stats = stats.groupby("split", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_chars_sum=("n_chars_sum", "sum")
    )
    if len(stats) == 0:
        return pa.table(
            {
                "split": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_sources": pa.array([], pa.int64()),
                "n_chars_sum": pa.array([], pa.int64()),
                "n_leaked_texts": pa.array([], pa.int64()),
            }
        )
    srcs = _stable(
        coarse_agg(
            docs.map_batches(src_partial, batch_format="pyarrow"),
            "source",
            {"n": ("count", "source")},
        )
        .map_batches(src_split_counts, batch_format="pyarrow")
        .to_pandas(),
        {"split": "object", "n_sources": "int64"},
    )
    srcs = srcs.groupby("split", as_index=False)["n_sources"].sum()
    leaks = _stable(
        drop_empty_blocks(
            docs.map_batches(leak_partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(leak_kernel, batch_format="pyarrow")
            .materialize()
        ).to_pandas(),
        {"n": "int64"},
    )
    n_leak = int(leaks["n"].sum())
    out = stats.merge(srcs, on="split", how="left")
    out["n_sources"] = out["n_sources"].fillna(0).astype("int64")
    out["n_leaked_texts"] = np.int64(n_leak)
    out = out[
        ["split", "n_docs", "n_sources", "n_chars_sum", "n_leaked_texts"]
    ].sort_values("split")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_LEAKAGE_SPLIT_AUDIT = """
WITH s AS (SELECT coalesce(text, '') AS text, n_chars,
                  coalesce(source, '') AS source,
                  CASE WHEN ('0x' || substr(md5(coalesce(source, '')), 1, 8))
                            ::UINTEGER % 10 < 8
                       THEN 'train' ELSE 'val' END AS split
           FROM documents),
leak AS (SELECT count(*) AS n FROM (
           SELECT text FROM s GROUP BY text
           HAVING count(DISTINCT split) = 2)),
g AS (SELECT split, count(*) AS n_docs,
             count(DISTINCT source) AS n_sources,
             sum(n_chars) AS n_chars_sum
      FROM s GROUP BY 1)
SELECT g.split, g.n_docs::BIGINT AS n_docs, g.n_sources::BIGINT AS n_sources,
       g.n_chars_sum::BIGINT AS n_chars_sum, leak.n::BIGINT AS n_leaked_texts
FROM g CROSS JOIN leak ORDER BY 1
"""


SQL_WORD_PMI = r"""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\w+')) AS t
  FROM documents),
df AS (SELECT t, count(*) AS df FROM tok GROUP BY 1),
vocab AS (SELECT t, df FROM df ORDER BY df DESC, t LIMIT 50),
vt AS (SELECT doc_id, t FROM tok WHERE t IN (SELECT t FROM vocab)),
pairs AS (SELECT x.t AS tok_a, y.t AS tok_b, count(*) AS n_ab
          FROM vt x JOIN vt y ON x.doc_id = y.doc_id AND x.t < y.t
          GROUP BY 1, 2),
nd AS (SELECT count(*) AS n FROM documents)
SELECT p.tok_a, p.tok_b, p.n_ab::BIGINT AS n_ab,
       round(ln(p.n_ab * 1.0 * nd.n / (va.df * vb.df)), 6) AS pmi
FROM pairs p
CROSS JOIN nd
JOIN vocab va ON va.t = p.tok_a
JOIN vocab vb ON vb.t = p.tok_b
WHERE p.n_ab >= 5
ORDER BY 1, 2
"""


def q_shingle_dup_fraction(sf_dir: str):
    """Per-document CORPUS-DUPLICATION fraction at shingle granularity —
    the substring-dedup signal of Lee et al. ("Deduplicating Training
    Data Makes Language Models Better") at 3-token resolution: for each
    document, the share of its distinct 3-token shingles that occur in
    at least one OTHER document.  Unlike the pair-producing joins
    (shingle_jaccard_join) this scores every doc against the WHOLE
    corpus in aggregate — the filter signal used to drop boilerplate-
    heavy pages before training.

    Scale shape: per-batch distinct (doc, shingle) combiner → ONE
    shingle-hash exchange where each partition holds EVERY occurrence of
    its shingles, so corpus df is a run length and the per-doc
    (n_shingles, n_dup) partial is computed entirely in-kernel → one
    doc-keyed coarse_agg over partials.  No join, no pair blow-up; the
    second exchange carries ≤ one row per (doc, part).  At 100 TB the
    string shingle column would swap for a 128-bit hash (collision-free
    at corpus scale); the string form keeps the DuckDB twin exact."""
    import pandas as pd

    from anansi_ray.arrowds import coarse_agg, drop_empty_blocks

    N_PARTS = 32

    def doc_shingles(b: pa.Table) -> pa.Table:
        ridx, sh = ftext.shingles_for_batch(b, k=3)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"doc_id": ids[ridx], "sh": np.asarray(sh, dtype=object)}
        ).drop_duplicates()
        h = pd.util.hash_array(df["sh"].to_numpy(dtype=object))
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
                "sh": pa.array(df["sh"].to_numpy(dtype=object), pa.string()),
                "part": pa.array((h % N_PARTS).astype(np.int32), pa.int32()),
            }
        )

    part_empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_sh": pa.array([], pa.int64()),
            "n_dup": pa.array([], pa.int64()),
        }
    )

    def dup_partial(g: pa.Table) -> pa.Table:
        # (doc, sh) rows are globally distinct and every occurrence of a
        # shingle lands in this part → df(sh) == its run length here, and
        # the per-doc dup count needs no cross-part information.
        if g.num_rows == 0:
            return part_empty
        pdf = g.to_pandas().sort_values(["sh", "doc_id"], kind="stable")
        sh = pdf["sh"].to_numpy(dtype=object)
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        sizes = np.diff(np.r_[starts, len(sh)])
        dup = np.repeat(sizes >= 2, sizes)
        agg = (
            pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(), "dup": dup})
            .groupby("doc_id", sort=False)
            .agg(n_sh=("dup", "size"), n_dup=("dup", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "doc_id": pa.array(agg["doc_id"].to_numpy(np.int64), pa.int64()),
                "n_sh": pa.array(agg["n_sh"].to_numpy(np.int64), pa.int64()),
                "n_dup": pa.array(agg["n_dup"].to_numpy(np.int64), pa.int64()),
            }
        )

    partials = drop_empty_blocks(
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(doc_shingles, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dup_partial, batch_format="pyarrow")
        .materialize()
    )
    out = _stable(
        coarse_agg(
            partials,
            "doc_id",
            {"n_shingles": ("sum", "n_sh"), "n_dup": ("sum", "n_dup")},
        ).to_pandas(),
        {"doc_id": "int64", "n_shingles": "int64", "n_dup": "int64"},
    ).sort_values("doc_id")
    out["dup_frac"] = (out["n_dup"] / out["n_shingles"]).round(6)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_SHINGLE_DUP_FRACTION = r"""
WITH w AS (SELECT doc_id,
                  regexp_extract_all(lower(coalesce(text, '')), '\w+') AS ws
           FROM documents),
g AS (SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
c AS (SELECT sh, count(*) AS df FROM g GROUP BY 1)
SELECT g.doc_id,
       count(*)::BIGINT AS n_shingles,
       (count(*) FILTER (c.df >= 2))::BIGINT AS n_dup,
       round((count(*) FILTER (c.df >= 2)) * 1.0 / count(*), 6) AS dup_frac
FROM g JOIN c USING (sh)
GROUP BY 1 ORDER BY 1
"""


def q_corpus_datacard(sf_dir: str):
    """One-row corpus DATA CARD — the summary sheet published alongside a
    training corpus (docs, chars, whitespace tokens, exact-dup rate,
    language inventory, dominant language, mean doc length), computed in
    one streaming pass plus one tiny metadata read.

    Scale shape: the text pass feeds ONE coarse hash exchange keyed on the
    sha256 content hash (count + char/token sums per distinct text), then
    a per-block second-stage combiner collapses that to scalar partials —
    the driver sees O(#blocks) rows, never one row per distinct text.  The
    language histogram is a separate single-column pruned read whose
    per-batch value_counts ships ≤ |alphabet| rows.  Empty corpus follows
    the pinned SQL semantics: COUNT → 0, sums/ratios → NULL."""
    import pandas as pd

    from anansi_ray.arrowds import coarse_agg

    def partial(b: pa.Table) -> pa.Table:
        n_ws, _ = ftext._ws_tokens(b["text"])
        chars = (
            pc.fill_null(pc.utf8_length(b["text"]), 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        h = fdedup.text_hash_batch(b.select(["text"]))["text_hash"]
        return pa.table(
            {
                "text_hash": h,
                "n_chars": pa.array(chars, pa.int64()),
                "n_toks": pa.array(n_ws, pa.int64()),
            }
        )

    def reduce_block(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_distinct": pa.array([b.num_rows], pa.int64()),
                "n_docs": pa.array([int(pc.sum(b["n"]).as_py() or 0)], pa.int64()),
                "chars": pa.array(
                    [int(pc.sum(b["chars"]).as_py() or 0)], pa.int64()
                ),
                "toks": pa.array([int(pc.sum(b["toks"]).as_py() or 0)], pa.int64()),
            }
        )

    scalars = _stable(
        coarse_agg(
            _read(sf_dir, "documents", ["text"]).map_batches(
                partial, batch_format="pyarrow"
            ),
            "text_hash",
            {
                "n": ("count", "text_hash"),
                "chars": ("sum", "n_chars"),
                "toks": ("sum", "n_toks"),
            },
        )
        .map_batches(reduce_block, batch_format="pyarrow")
        .to_pandas(),
        {
            "n_distinct": "int64",
            "n_docs": "int64",
            "chars": "int64",
            "toks": "int64",
        },
    )

    def lang_partial(b: pa.Table) -> pa.Table:
        vc = b["lang"].to_pandas().value_counts()
        return pa.table(
            {
                "lang": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "c": pa.array(vc.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    langs = _stable(
        _read(sf_dir, "documents", ["lang"])
        .map_batches(lang_partial, batch_format="pyarrow")
        .to_pandas(),
        {"lang": "object", "c": "int64"},
    )
    langs = langs.groupby("lang", as_index=False)["c"].sum()

    n_docs = int(scalars["n_docs"].sum())
    n_distinct = int(scalars["n_distinct"].sum())
    total_chars = int(scalars["chars"].sum()) if n_docs else None
    total_toks = int(scalars["toks"].sum()) if n_docs else None
    n_langs = int(len(langs))
    if len(langs):
        top = langs.sort_values(
            ["c", "lang"], ascending=[False, True], kind="stable"
        ).iloc[0]
        top_lang, top_c = str(top["lang"]), int(top["c"])
    else:
        top_lang, top_c = None, None
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "total_chars": pa.array([total_chars], pa.int64()),
            "total_tokens_ws": pa.array([total_toks], pa.int64()),
            "n_distinct_texts": pa.array([n_distinct], pa.int64()),
            "dup_frac": pa.array(
                [round(1.0 - n_distinct * 1.0 / n_docs, 6) if n_docs else None],
                pa.float64(),
            ),
            "n_langs": pa.array([n_langs], pa.int64()),
            "top_lang": pa.array([top_lang], pa.string()),
            "top_lang_share": pa.array(
                [round(top_c * 1.0 / n_docs, 6) if n_docs else None],
                pa.float64(),
            ),
            "avg_chars": pa.array(
                [round(total_chars * 1.0 / n_docs, 6) if n_docs else None],
                pa.float64(),
            ),
        }
    )


SQL_CORPUS_DATACARD = r"""
WITH t AS (SELECT count(*) AS n_docs,
                  sum(length(text)) AS total_chars,
                  sum(len(string_split_regex(trim(text), '\s+')))
                    AS total_tokens_ws,
                  count(DISTINCT substr(sha256(text), 1, 32))
                    AS n_distinct_texts,
                  count(DISTINCT lang) AS n_langs
           FROM documents),
l AS (SELECT lang, count(*) AS c FROM documents
      GROUP BY 1 ORDER BY c DESC, lang LIMIT 1)
SELECT n_docs::BIGINT AS n_docs,
       total_chars::BIGINT AS total_chars,
       total_tokens_ws::BIGINT AS total_tokens_ws,
       n_distinct_texts::BIGINT AS n_distinct_texts,
       CASE WHEN n_docs > 0
            THEN round(1.0 - n_distinct_texts * 1.0 / n_docs, 6) END
         AS dup_frac,
       n_langs::BIGINT AS n_langs,
       (SELECT lang FROM l) AS top_lang,
       CASE WHEN n_docs > 0
            THEN round((SELECT c FROM l) * 1.0 / n_docs, 6) END
         AS top_lang_share,
       CASE WHEN n_docs > 0
            THEN round(total_chars * 1.0 / n_docs, 6) END AS avg_chars
FROM t
"""


def q_segment_ttest(sf_dir: str):
    """Welch's two-sample t-test of order value between every pair of
    customer market segments — the hypothesis-testing primitive behind
    "is segment A actually spending more than segment B, or is that
    noise?".  Emits the t statistic and Welch–Satterthwaite degrees of
    freedom per unordered segment pair.

    Exactness: partials carry (n, Σcents, Σcents² as two int64 limbs —
    the lineitem_variance overflow trick), so the driver holds EXACT
    integer moments; the float finish then applies the IDENTICAL
    double-precision expression tree as the SQL twin (casts from exact
    ints, same operation order, correctly-rounded sqrt), making the
    rounded outputs bit-stable.

    Scale shape: broadcast dim probe (ray.put + index_in, no per-row
    Python) and a |segments|-row combiner per batch; the all-pairs finish
    runs on a 5-row table."""
    import math

    import ray
    from ray.data.aggregate import Sum

    LIMB = 10**9

    cust_tbl = pa.Table.from_pandas(
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas(),
        preserve_index=False,
    ).combine_chunks()
    ref = ray.put(cust_tbl)

    def partial(b: pa.Table) -> pa.Table:
        cust = ray.get(ref)
        idx = pc.index_in(b["o_custkey"], cust["c_custkey"])
        hit = pc.is_valid(idx)
        seg = np.asarray(
            cust["c_mktsegment"].combine_chunks().take(idx.filter(hit)).to_pylist(),
            dtype=object,
        )
        cents = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"].filter(hit), 100.0)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(seg, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        s1 = np.zeros(len(uniq), np.int64)
        np.add.at(s1, inv, cents)
        sq = cents * cents  # ≤ ~3.6e15 per row: inside int64
        hi = np.zeros(len(uniq), np.int64)
        np.add.at(hi, inv, sq // LIMB)
        lo = np.zeros(len(uniq), np.int64)
        np.add.at(lo, inv, sq % LIMB)
        return pa.table(
            {
                "seg": pa.array(uniq, pa.string()),
                "n": pa.array(n, pa.int64()),
                "s1": pa.array(s1, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "lo": pa.array(lo, pa.int64()),
            }
        )

    agg = _stable(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("seg")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s1", alias_name="s1"),
            Sum("hi", alias_name="hi"),
            Sum("lo", alias_name="lo"),
        )
        .to_pandas(),
        {"seg": "object", "n": "int64", "s1": "int64", "hi": "int64", "lo": "int64"},
    ).sort_values("seg")

    stats = []
    for _, r in agg.iterrows():
        n = int(r["n"])
        if n < 2:
            continue
        s1 = int(r["s1"])
        s2 = int(r["hi"]) * LIMB + int(r["lo"])
        f1 = float(s1)
        mean = f1 / n
        var = (float(s2) - f1 * f1 / n) / (n - 1)
        stats.append((str(r["seg"]), n, mean, var))

    rows = {
        "seg_a": [], "seg_b": [], "n_a": [], "n_b": [],
        "mean_a": [], "mean_b": [], "t_stat": [], "welch_dof": [],
    }
    for i in range(len(stats)):
        for j in range(i + 1, len(stats)):
            (sa, na, ma, va), (sb, nb, mb, vb) = stats[i], stats[j]
            va_n, vb_n = va / na, vb / nb
            se2 = va_n + vb_n
            t = (ma - mb) / math.sqrt(se2)
            dof = se2 * se2 / (
                va_n * va_n / (na - 1) + vb_n * vb_n / (nb - 1)
            )
            rows["seg_a"].append(sa)
            rows["seg_b"].append(sb)
            rows["n_a"].append(na)
            rows["n_b"].append(nb)
            rows["mean_a"].append(round(ma, 6))
            rows["mean_b"].append(round(mb, 6))
            rows["t_stat"].append(round(t, 6))
            rows["welch_dof"].append(round(dof, 6))
    return pa.table(
        {
            "seg_a": pa.array(rows["seg_a"], pa.string()),
            "seg_b": pa.array(rows["seg_b"], pa.string()),
            "n_a": pa.array(rows["n_a"], pa.int64()),
            "n_b": pa.array(rows["n_b"], pa.int64()),
            "mean_a": pa.array(rows["mean_a"], pa.float64()),
            "mean_b": pa.array(rows["mean_b"], pa.float64()),
            "t_stat": pa.array(rows["t_stat"], pa.float64()),
            "welch_dof": pa.array(rows["welch_dof"], pa.float64()),
        }
    )


SQL_SEGMENT_TTEST = """
WITH j AS (SELECT c_mktsegment AS seg,
                  (round(o_totalprice * 100))::BIGINT AS cents
           FROM orders JOIN customer ON o_custkey = c_custkey),
s AS (SELECT seg, count(*) AS n,
             sum(cents::HUGEINT) AS s1,
             sum(cents::HUGEINT * cents) AS s2
      FROM j GROUP BY 1),
m AS (SELECT seg, n,
             s1::DOUBLE / n AS mean,
             (s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / n) / (n - 1) AS var
      FROM s WHERE n >= 2),
p AS (SELECT a.seg AS seg_a, b.seg AS seg_b,
             a.n AS n_a, b.n AS n_b,
             a.mean AS mean_a, b.mean AS mean_b,
             a.var / a.n AS va_n, b.var / b.n AS vb_n
      FROM m a JOIN m b ON a.seg < b.seg)
SELECT seg_a, seg_b, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
       round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
       round((mean_a - mean_b) / sqrt(va_n + vb_n), 6) AS t_stat,
       round((va_n + vb_n) * (va_n + vb_n) /
             (va_n * va_n / (n_a - 1) + vb_n * vb_n / (n_b - 1)), 6)
         AS welch_dof
FROM p ORDER BY 1, 2
"""


def q_lineitem_corr(sf_dir: str):
    """Exact Pearson correlation matrix over the lineitem numeric columns
    (price, quantity, discount) — the feature-covariance primitive that
    feeds whitening / feature selection.  Every moment (n, Σx, Σy, Σx²,
    Σy², Σxy) is carried as EXACT integers on a fixed-point grid (cents
    ×100, discount ×100, quantity ×1), with the split-limb trick on every
    product involving cents so the int64 partials never overflow; the
    driver recombines into Python big ints and both engines cast the
    identical exact quantities to double at the same points (r = num /
    (√vx·√vy)), so the rounded r is bit-stable vs the HUGEINT twin.

    Scale shape: ONE streaming pass, 13 scalar partial columns per batch,
    driver combine over O(#batches) rows.  Zero-variance / n<2 pairs are
    omitted on both sides."""
    import math

    LIMB = 10**9

    def partial(b: pa.Table) -> pa.Table:
        p = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        q = pc.cast(pc.round(b["l_quantity"]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = pc.cast(
            pc.round(pc.multiply(b["l_discount"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)

        def limb_sum(prod: np.ndarray) -> tuple[int, int]:
            return int(np.sum(prod // LIMB)), int(np.sum(prod % LIMB))

        pp_hi, pp_lo = limb_sum(p * p)
        pq_hi, pq_lo = limb_sum(p * q)
        pd_hi, pd_lo = limb_sum(p * d)
        cols = {
            "n": len(p),
            "sp": int(p.sum()),
            "sq": int(q.sum()),
            "sd": int(d.sum()),
            "pp_hi": pp_hi, "pp_lo": pp_lo,
            "pq_hi": pq_hi, "pq_lo": pq_lo,
            "pd_hi": pd_hi, "pd_lo": pd_lo,
            "sqq": int((q * q).sum()),
            "sdd": int((d * d).sum()),
            "sqd": int((q * d).sum()),
        }
        return pa.table({k: pa.array([v], pa.int64()) for k, v in cols.items()})

    cols = [
        "n", "sp", "sq", "sd", "pp_hi", "pp_lo", "pq_hi", "pq_lo",
        "pd_hi", "pd_lo", "sqq", "sdd", "sqd",
    ]
    parts = _stable(
        _read(
            sf_dir, "lineitem", ["l_extendedprice", "l_quantity", "l_discount"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas(),
        {c: "int64" for c in cols},
    )
    m = {c: int(parts[c].sum()) for c in cols}
    n = m["n"]
    spp = m["pp_hi"] * LIMB + m["pp_lo"]
    spq = m["pq_hi"] * LIMB + m["pq_lo"]
    spd = m["pd_hi"] * LIMB + m["pd_lo"]
    moments = {
        "l_extendedprice": (m["sp"], spp),
        "l_quantity": (m["sq"], m["sqq"]),
        "l_discount": (m["sd"], m["sdd"]),
    }
    cross = {
        ("l_discount", "l_extendedprice"): spd,
        ("l_discount", "l_quantity"): m["sqd"],
        ("l_extendedprice", "l_quantity"): spq,
    }
    out = {"col_a": [], "col_b": [], "n": [], "r": []}
    for (a, b_), sxy in sorted(cross.items()):
        sx, sxx = moments[a]
        sy, syy = moments[b_]
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if n < 2 or vx <= 0 or vy <= 0:
            continue
        num = n * sxy - sx * sy
        r = float(num) / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
        out["col_a"].append(a)
        out["col_b"].append(b_)
        out["n"].append(n)
        out["r"].append(round(r, 6))
    return pa.table(
        {
            "col_a": pa.array(out["col_a"], pa.string()),
            "col_b": pa.array(out["col_b"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "r": pa.array(out["r"], pa.float64()),
        }
    )


SQL_LINEITEM_CORR = """
WITH x AS (SELECT (round(l_extendedprice * 100))::BIGINT AS p,
                  (round(l_quantity))::BIGINT AS q,
                  (round(l_discount * 100))::BIGINT AS d
           FROM lineitem),
s AS (SELECT count(*) AS n,
             sum(p::HUGEINT) AS sp, sum(q::HUGEINT) AS sq,
             sum(d::HUGEINT) AS sd,
             sum(p::HUGEINT * p) AS spp, sum(q::HUGEINT * q) AS sqq,
             sum(d::HUGEINT * d) AS sdd,
             sum(p::HUGEINT * q) AS spq, sum(p::HUGEINT * d) AS spd,
             sum(q::HUGEINT * d) AS sqd
      FROM x),
pairs AS (
  SELECT 'l_discount' AS col_a, 'l_extendedprice' AS col_b, n,
         n * spd - sd * sp AS num, n * sdd - sd * sd AS vx,
         n * spp - sp * sp AS vy FROM s
  UNION ALL
  SELECT 'l_discount', 'l_quantity', n,
         n * sqd - sd * sq, n * sdd - sd * sd, n * sqq - sq * sq FROM s
  UNION ALL
  SELECT 'l_extendedprice', 'l_quantity', n,
         n * spq - sp * sq, n * spp - sp * sp, n * sqq - sq * sq FROM s)
SELECT col_a, col_b, n::BIGINT AS n,
       round(num::DOUBLE / (sqrt(vx::DOUBLE) * sqrt(vy::DOUBLE)), 6) AS r
FROM pairs
WHERE n >= 2 AND vx > 0 AND vy > 0
ORDER BY 1, 2
"""


def q_ngram_repetition_share(sf_dir: str):
    """Within-doc 5-gram repetition share — the Gopher-family repetition
    signal at gram granularity (a doc whose 5-grams repeat is boilerplate
    or a generation loop): per doc, total 5-grams, distinct 5-grams, and
    ``1 − distinct/total``.  Entirely per-doc: one vectorized streaming
    pass (shingles via Arrow split + flattened parent index; distinct via
    one pandas drop_duplicates per batch), zero shuffle at any corpus
    size.  Token model = ``\\w+`` over lowercase, same as the shingle
    join family, so the SQL twin recomputes it verbatim."""
    import pandas as pd

    from anansi_ray.functions.text import shingles_for_batch

    spec = {
        "doc_id": pa.int64(),
        "n5": pa.int64(),
        "d5": pa.int64(),
        "rep_share": pa.float64(),
    }

    def part(b: pa.Table) -> pa.Table:
        n = b.num_rows
        ridx, sh = shingles_for_batch(b, k=5)
        n5 = np.bincount(ridx, minlength=n).astype(np.int64)
        d5 = np.zeros(n, np.int64)
        if len(ridx):
            dd = (
                pd.DataFrame({"r": ridx, "s": np.asarray(sh, dtype=object)})
                .drop_duplicates()
                .groupby("r")
                .size()
            )
            d5[dd.index.to_numpy()] = dd.to_numpy()
        share = np.where(n5 > 0, 1.0 - d5 / np.maximum(n5, 1), 0.0)
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "n5": pa.array(n5, pa.int64()),
                "d5": pa.array(d5, pa.int64()),
                "rep_share": pa.array(np.round(share, 6), pa.float64()),
            }
        )

    out = _stable(
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(part, batch_format="pyarrow")
        .to_pandas(),
        {
            "doc_id": "int64",
            "n5": "int64",
            "d5": "int64",
            "rep_share": "float64",
        },
    ).sort_values("doc_id")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_NGRAM_REPETITION_SHARE = r"""
WITH w AS (SELECT doc_id,
                  regexp_extract_all(lower(coalesce(text, '')), '\w+') AS ws
           FROM documents),
g AS (SELECT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                   || ' ' || ws[i+4] AS sh
      FROM w, unnest(range(1, greatest(len(ws) - 3, 1))) t(i)),
a AS (SELECT doc_id, count(*)::BIGINT AS n5,
             count(DISTINCT sh)::BIGINT AS d5
      FROM g GROUP BY 1)
SELECT d.doc_id,
       coalesce(a.n5, 0)::BIGINT AS n5,
       coalesce(a.d5, 0)::BIGINT AS d5,
       round(CASE WHEN coalesce(a.n5, 0) = 0 THEN 0.0
             ELSE 1.0 - a.d5 * 1.0 / a.n5 END, 6) AS rep_share
FROM documents d LEFT JOIN a USING (doc_id) ORDER BY doc_id
"""


def q_token_fertility_by_lang(sf_dir: str):
    """Tokenizer fertility by language — BPE-ish tokens per whitespace
    word, the cost metric a multilingual tokenizer is judged on (fertility
    ≫1 for a language means its docs burn context length).  Per-batch
    partial: the two token_count kernels reduced to ≤|langs| rows, then
    one tiny lang-keyed aggregate; zero corpus-sized traffic."""
    import pandas as pd

    from anansi_ray.arrowds import coarse_agg

    def part(b: pa.Table) -> pa.Table:
        t = ftext.token_count_batch(b)
        lang = pc.fill_null(b["lang"], "").to_pandas().to_numpy(dtype=object)
        df = pd.DataFrame(
            {
                "lang": lang,
                "n_docs": np.ones(b.num_rows, np.int64),
                "sum_ws": t["n_tokens_ws"].to_numpy(zero_copy_only=False),
                "sum_bpe": t["n_tokens"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("lang", sort=True).sum().reset_index()
        return pa.table(
            {
                "lang": pa.array(g["lang"].to_numpy(dtype=object), pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(np.int64), pa.int64()),
                "sum_ws": pa.array(g["sum_ws"].to_numpy(np.int64), pa.int64()),
                "sum_bpe": pa.array(g["sum_bpe"].to_numpy(np.int64), pa.int64()),
            }
        )

    agg = coarse_agg(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
            part, batch_format="pyarrow"
        ),
        "lang",
        {
            "n_docs": ("sum", "n_docs"),
            "sum_ws": ("sum", "sum_ws"),
            "sum_bpe": ("sum", "sum_bpe"),
        },
        n_parts=8,
    ).to_pandas()
    spec = {
        "lang": pa.string(),
        "n_docs": pa.int64(),
        "sum_ws": pa.int64(),
        "sum_bpe": pa.int64(),
        "fertility": pa.float64(),
    }
    if len(agg) == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    agg = agg.sort_values("lang", ignore_index=True)
    ws = agg["sum_ws"].to_numpy(np.int64)
    bpe = agg["sum_bpe"].to_numpy(np.int64)
    return pa.table(
        {
            "lang": pa.array(agg["lang"].to_numpy(dtype=object), pa.string()),
            "n_docs": pa.array(agg["n_docs"].to_numpy(np.int64), pa.int64()),
            "sum_ws": pa.array(ws, pa.int64()),
            "sum_bpe": pa.array(bpe, pa.int64()),
            "fertility": pa.array(
                np.round(bpe / np.maximum(ws, 1), 6), pa.float64()
            ),
        }
    )


SQL_TOKEN_FERTILITY_BY_LANG = r"""
WITH t AS (
  SELECT coalesce(lang, '') AS lang,
         len(string_split_regex(trim(text), '\s+'))::BIGINT AS ws,
         len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]'))::BIGINT
           AS bpe
  FROM documents)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(ws)::BIGINT AS sum_ws, sum(bpe)::BIGINT AS sum_bpe,
       round(sum(bpe) * 1.0 / greatest(sum(ws), 1), 6) AS fertility
FROM t GROUP BY lang ORDER BY lang
"""


def q_unigram_surprisal(sf_dir: str):
    """Per-doc mean unigram surprisal under the corpus's own language
    model — the cheap perplexity-filter signal (CCNet-style): docs whose
    tokens are globally rare score high, boilerplate scores low.

    Fully distributed with NO vocabulary broadcast: per-batch distinct
    (doc, token, count) partials → ONE token-hash exchange whose kernel
    sees every occurrence row of its tokens (global count = in-kernel
    sum) and folds each doc's Σ c·ln(cnt) share → one doc-keyed coarse
    sum → driver math on the two scalars-per-doc result.  Works at any
    vocabulary size because token rows only ever meet inside their hash
    partition."""
    import pandas as pd

    from anansi_ray.arrowds import coarse_agg

    n_parts = 32
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def occ_partial(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b["text"], "")), r"\W+"
        )
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_pandas().to_numpy(dtype=object)
        parent = np.repeat(ids, lens)
        keep = flat != ""
        df = (
            pd.DataFrame({"doc_id": parent[keep], "tok": flat[keep]})
            .groupby(["doc_id", "tok"], sort=False)
            .size()
            .reset_index(name="c")
        )
        tok = df["tok"].to_numpy(dtype=object)
        part = (pd.util.hash_array(tok) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                "part": pa.array(part, pa.int32()),
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
                "tok": pa.array(tok, pa.string()),
                "c": pa.array(df["c"].to_numpy(np.int64), pa.int64()),
            }
        )

    _tok_empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "s": pa.array([], pa.float64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def tok_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _tok_empty
        pdf = g.to_pandas()
        cnt = pdf.groupby("tok")["c"].transform("sum").to_numpy(np.int64)
        c = pdf["c"].to_numpy(np.int64)
        contrib = c * np.log(cnt.astype(np.float64))
        agg = (
            pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(np.int64), "s": contrib, "n": c}
            )
            .groupby("doc_id", sort=True)
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "doc_id": pa.array(agg["doc_id"].to_numpy(np.int64), pa.int64()),
                "s": pa.array(agg["s"].to_numpy(np.float64), pa.float64()),
                "n": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    per_doc = coarse_agg(
        docs.map_batches(occ_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(tok_part, batch_format="pyarrow"),
        "doc_id",
        {"s": ("sum", "s"), "n": ("sum", "n")},
    ).to_pandas()
    spec = {
        "doc_id": pa.int64(),
        "n_toks": pa.int64(),
        "mean_surprisal": pa.float64(),
    }
    all_ids = (
        _read(sf_dir, "documents", ["doc_id"]).to_pandas()["doc_id"].to_numpy()
    )
    if len(all_ids) == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    total = int(per_doc["n"].sum()) if len(per_doc) else 0
    out = pd.DataFrame({"doc_id": np.sort(all_ids.astype(np.int64))}).merge(
        per_doc, on="doc_id", how="left"
    )
    n = out["n"].fillna(0).to_numpy(np.int64)
    s = out["s"].fillna(0.0).to_numpy(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        m = np.where(
            n > 0,
            (np.log(max(total, 1)) - s / np.maximum(n, 1)) / np.log(2.0),
            0.0,
        )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].to_numpy(np.int64), pa.int64()),
            "n_toks": pa.array(n, pa.int64()),
            "mean_surprisal": pa.array(np.round(m, 6), pa.float64()),
        }
    )


SQL_UNIGRAM_SURPRISAL = r"""
WITH occ AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\w+')) AS tok
  FROM documents),
cnt AS (SELECT tok, count(*)::BIGINT AS c FROM occ GROUP BY tok),
tot AS (SELECT count(*)::BIGINT AS n FROM occ),
per AS (
  SELECT o.doc_id, count(*)::BIGINT AS n_toks, sum(ln(cnt.c)) AS s
  FROM occ o JOIN cnt USING (tok) GROUP BY o.doc_id)
SELECT d.doc_id,
       coalesce(p.n_toks, 0)::BIGINT AS n_toks,
       round(CASE WHEN coalesce(p.n_toks, 0) = 0 THEN 0.0
             ELSE (ln(tot.n) - p.s / p.n_toks) / ln(2) END, 6)
         AS mean_surprisal
FROM documents d LEFT JOIN per p USING (doc_id), tot
ORDER BY d.doc_id
"""


def q_dup_cluster_quality(sf_dir: str):
    """Dedup-cluster QUALITY report: for every MinHash near-dup component
    of size ≥ 2, the mean pairwise EXACT 3-token-shingle Jaccard of its
    members — the precision audit a curation run publishes next to its
    dedup rate (a low-quality cluster means the LSH banding over-merged).

    Composes the two memoized cluster artifacts with zero recompute:
    labels from ``_minhash_cc_labels`` and shingles from
    ``_shingle_stamped_ds``.  Two coarse co-partition exchanges: (1)
    doc-hash to attach each shingle row (and one per-doc sentinel, so
    shingle-less docs still count) to its component, (2) component-hash
    so each kernel sees a whole component and computes its pairwise
    intersections with one vectorized self-merge.  Pair count is
    quadratic only per component (LSH clusters are near-cliques and
    small); a corpus with pathological mega-clusters would sample pairs
    per cluster — documented cap, not needed at tested scales.  Both
    members empty ⇒ Jaccard 1.0 (identical empties), matching
    ``ngram_jaccard``'s convention and the SQL twin."""
    import pandas as pd

    P = 32
    labels = _minhash_cc_labels(sf_dir)
    stamped = _shingle_stamped_ds(sf_dir)
    spec = {
        "dup_group": pa.int64(),
        "n_docs": pa.int64(),
        "n_pairs": pa.int64(),
        "mean_jaccard": pa.float64(),
    }

    def tag_lab(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((d % P).astype(np.int32), pa.int32()),
                "doc_id": pa.array(d, pa.int64()),
                "grp": b["dup_group"].cast(pa.int64()),
                "sh": pa.array([None] * len(d), pa.string()),
            }
        )

    def tag_sh(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((d % P).astype(np.int32), pa.int32()),
                "doc_id": pa.array(d, pa.int64()),
                "grp": pa.array(np.full(len(d), -1, np.int64), pa.int64()),
                "sh": b["sh"],
            }
        )

    _h1_empty = pa.table(
        {
            "gpart": pa.array([], pa.int32()),
            "grp": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "sh": pa.array([], pa.string()),
        }
    )

    def attach_grp(g: pa.Table) -> pa.Table:
        # label rows carry grp; shingle rows look their doc's grp up and
        # re-emit (including the label row itself as the per-doc sentinel)
        if g.num_rows == 0:
            return _h1_empty
        pdf = g.to_pandas()
        lab = pdf[pdf["grp"] >= 0]
        gmap = dict(zip(lab["doc_id"], lab["grp"]))
        pdf = pdf.copy()
        pdf["grp"] = pdf["doc_id"].map(gmap)
        pdf = pdf.dropna(subset=["grp"])
        grp = pdf["grp"].to_numpy(np.int64)
        return pa.table(
            {
                "gpart": pa.array((grp % P).astype(np.int32), pa.int32()),
                "grp": pa.array(grp, pa.int64()),
                "doc_id": pa.array(pdf["doc_id"].to_numpy(np.int64), pa.int64()),
                "sh": pa.array(pdf["sh"].to_numpy(dtype=object), pa.string()),
            }
        )

    _out_empty = pa.table({c: pa.array([], t) for c, t in spec.items()})

    def cluster_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _out_empty
        pdf = g.to_pandas()
        sent = pdf[pdf["sh"].isna()]
        members = sent.groupby("grp")["doc_id"].nunique()
        big = members[members >= 2]
        if len(big) == 0:
            return _out_empty
        sh = pdf[pdf["sh"].notna() & pdf["grp"].isin(big.index)]
        sizes = (
            sh.groupby(["grp", "doc_id"]).size()
            if len(sh)
            else pd.Series(dtype=np.int64)
        )
        rows = []
        for grp_id, n_docs in big.sort_index().items():
            docs = np.sort(
                sent.loc[sent["grp"] == grp_id, "doc_id"].unique()
            )
            gsh = sh[sh["grp"] == grp_id]
            inter = {}
            if len(gsh):
                m = gsh.merge(gsh, on="sh")
                m = m[m["doc_id_x"] < m["doc_id_y"]]
                if len(m):
                    inter = (
                        m.groupby(["doc_id_x", "doc_id_y"]).size().to_dict()
                    )
            nsh = {
                d: int(sizes.get((grp_id, d), 0)) for d in docs
            }
            js = []
            for ai in range(len(docs)):
                for bi in range(ai + 1, len(docs)):
                    a, b = int(docs[ai]), int(docs[bi])
                    i = int(inter.get((a, b), 0))
                    u = nsh[a] + nsh[b] - i
                    js.append(1.0 if u == 0 else i / u)
            rows.append(
                (int(grp_id), int(n_docs), len(js), round(float(np.mean(js)), 6))
            )
        return pa.table(
            {
                "dup_group": pa.array([r[0] for r in rows], pa.int64()),
                "n_docs": pa.array([r[1] for r in rows], pa.int64()),
                "n_pairs": pa.array([r[2] for r in rows], pa.int64()),
                "mean_jaccard": pa.array([r[3] for r in rows], pa.float64()),
            }
        )

    out = (
        labels.map_batches(tag_lab, batch_format="pyarrow")
        .union(stamped.map_batches(tag_sh, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(attach_grp, batch_format="pyarrow")
        .groupby("gpart")
        .map_groups(cluster_kernel, batch_format="pyarrow")
    )
    tbl = fdedup._collect_sorted(out, ["dup_group"])
    if tbl is None:
        return _out_empty
    return tbl


SQL_DUP_CLUSTER_QUALITY = rf"""
WITH grp AS (
  SELECT doc_id, dup_group
  FROM read_parquet('{ORACLE_DIR}/minhash_groups.parquet')),
big AS (SELECT dup_group FROM grp GROUP BY 1 HAVING count(*) >= 2),
mem AS (SELECT g.doc_id, g.dup_group FROM grp g JOIN big USING (dup_group)),
w AS (SELECT doc_id,
             regexp_extract_all(lower(coalesce(text, '')), '\w+') AS ws
      FROM documents JOIN mem USING (doc_id)),
g AS (SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM g GROUP BY 1),
pairs AS (
  SELECT a.dup_group, a.doc_id AS da, b.doc_id AS db
  FROM mem a JOIN mem b
    ON a.dup_group = b.dup_group AND a.doc_id < b.doc_id),
inter AS (
  SELECT p.dup_group, p.da, p.db, count(*)::BIGINT AS i
  FROM pairs p
  JOIN g ga ON ga.doc_id = p.da
  JOIN g gb ON gb.doc_id = p.db AND gb.sh = ga.sh
  GROUP BY 1, 2, 3),
pj AS (
  SELECT p.dup_group,
         CASE WHEN coalesce(sa.n, 0) + coalesce(sb.n, 0)
                   - coalesce(i.i, 0) = 0 THEN 1.0
              ELSE coalesce(i.i, 0) * 1.0
                   / (coalesce(sa.n, 0) + coalesce(sb.n, 0)
                      - coalesce(i.i, 0)) END AS j
  FROM pairs p
  LEFT JOIN inter i
    ON i.dup_group = p.dup_group AND i.da = p.da AND i.db = p.db
  LEFT JOIN sizes sa ON sa.doc_id = p.da
  LEFT JOIN sizes sb ON sb.doc_id = p.db)
SELECT m.dup_group,
       count(DISTINCT m.doc_id)::BIGINT AS n_docs,
       (SELECT count(*) FROM pj WHERE pj.dup_group = m.dup_group)::BIGINT
         AS n_pairs,
       (SELECT round(avg(j), 6) FROM pj WHERE pj.dup_group = m.dup_group)
         AS mean_jaccard
FROM mem m GROUP BY m.dup_group ORDER BY m.dup_group
"""


def q_curation_packed(sf_dir: str):
    """END-TO-END curate→pack — the final step of the LLM-data story:
    only documents the curation chain KEEPS are next-fit packed into
    512-token training sequences (bucket-deterministic, text never
    shuffles).  Composes the memoized distributed disposition with the
    token-measure pass through ONE doc-hash co-partition exchange
    (narrow columns only), then the per-bucket pack kernel.  The SQL
    twin recomposes the disposition in DuckDB from the independent stage
    artifacts and runs an independent sequential next-fit over the kept
    docs (``pack_kept.parquet``)."""
    import pandas as pd

    from anansi_ray.functions.packing import (
        PACK_BUCKET,
        PACK_BUDGET,
        pack_bucket_ids,
    )

    P = 32
    disp = _curation_disposition_ds(sf_dir)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    spec = {
        "bucket": pa.int64(),
        "doc_id": pa.int64(),
        "seq_idx": pa.int64(),
        "offset": pa.int64(),
        "n_tokens": pa.int64(),
    }

    def measure(b: pa.Table) -> pa.Table:
        t = ftext.token_count_batch(b)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((ids % P).astype(np.int32), pa.int32()),
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": t["n_tokens"],
                "verdict": pa.array(np.full(len(ids), -1, np.int64), pa.int64()),
            }
        )

    def tag_verdict(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((ids % P).astype(np.int32), pa.int32()),
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(np.full(len(ids), -1, np.int64), pa.int64()),
                "verdict": b["verdict"].cast(pa.int64()),
            }
        )

    _kept_empty = pa.table(
        {
            "bucket": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
        }
    )

    def keep_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _kept_empty
        pdf = g.to_pandas()
        kept = set(
            pdf.loc[
                (pdf["verdict"] == _CURATION_KEPT) & (pdf["n_tokens"] < 0),
                "doc_id",
            ]
        )
        m = pdf[(pdf["n_tokens"] >= 0) & pdf["doc_id"].isin(kept)]
        ids = m["doc_id"].to_numpy(np.int64)
        return pa.table(
            {
                "bucket": pa.array(ids // PACK_BUCKET, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(m["n_tokens"].to_numpy(np.int64), pa.int64()),
            }
        )

    _pack_empty = pa.table({c: pa.array([], t) for c, t in spec.items()})

    def pack_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return _pack_empty
        gs = g.take(pc.sort_indices(g, sort_keys=[("doc_id", "ascending")]))
        ids = gs["doc_id"].to_numpy(zero_copy_only=False)
        toks = gs["n_tokens"].to_numpy(zero_copy_only=False)
        seq, off = pack_bucket_ids(ids, toks, PACK_BUDGET)
        return pa.table(
            {
                "bucket": gs["bucket"],
                "doc_id": gs["doc_id"],
                "seq_idx": pa.array(seq, pa.int64()),
                "offset": pa.array(off, pa.int64()),
                "n_tokens": gs["n_tokens"],
            }
        )

    out = (
        docs.map_batches(measure, batch_format="pyarrow")
        .union(disp.map_batches(tag_verdict, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(keep_kernel, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack_kernel, batch_format="pyarrow")
    )
    tbl = fdedup._collect_sorted(out, ["doc_id"])
    if tbl is None:
        return _pack_empty
    return tbl


SQL_CURATION_PACKED = f"""
SELECT bucket, doc_id, seq_idx, "offset", n_tokens
FROM read_parquet('{ORACLE_DIR}/pack_kept.parquet')
ORDER BY doc_id
"""


def q_dedup_rate_by_source(sf_dir: str):
    """Near-dup redundancy per SOURCE — which feeds are worth crawling:
    share of each source's docs that the MinHash components would drop
    (non-representative members).  Composes the memoized CC labels with
    the source column through ONE doc-hash co-partition exchange whose
    kernel reduces to per-source partials; the final aggregate is a tiny
    source-keyed coarse_agg.  Nothing corpus-sized reaches the driver."""
    import pandas as pd

    from anansi_ray.arrowds import coarse_agg

    P = 32
    labels = _minhash_cc_labels(sf_dir)
    src = _read(sf_dir, "documents", ["doc_id", "source"])
    spec = {
        "source": pa.string(),
        "n_docs": pa.int64(),
        "n_dup_dropped": pa.int64(),
        "dup_rate": pa.float64(),
    }

    def tag_lab(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dropped = (
            b["dup_group"].to_numpy(zero_copy_only=False) != d
        ).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((d % P).astype(np.int32), pa.int32()),
                "doc_id": pa.array(d, pa.int64()),
                "source": pa.array([None] * len(d), pa.string()),
                "dropped": pa.array(dropped, pa.int64()),
            }
        )

    def tag_src(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((d % P).astype(np.int32), pa.int32()),
                "doc_id": pa.array(d, pa.int64()),
                "source": pc.fill_null(b["source"], "").cast(pa.string()),
                "dropped": pa.array(np.full(len(d), -1, np.int64), pa.int64()),
            }
        )

    _partial_empty = pa.table(
        {
            "source": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "n_dropped": pa.array([], pa.int64()),
        }
    )

    def src_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _partial_empty
        pdf = g.to_pandas()
        lab = pdf[pdf["dropped"] >= 0]
        dmap = dict(zip(lab["doc_id"], lab["dropped"]))
        m = pdf[pdf["dropped"] < 0].copy()
        m["dropped"] = m["doc_id"].map(dmap)
        m = m.dropna(subset=["dropped"])
        agg = (
            m.groupby("source", sort=True)
            .agg(n_docs=("doc_id", "size"), n_dropped=("dropped", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(
                    agg["source"].to_numpy(dtype=object), pa.string()
                ),
                "n_docs": pa.array(agg["n_docs"].to_numpy(np.int64), pa.int64()),
                "n_dropped": pa.array(
                    agg["n_dropped"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    agg = coarse_agg(
        labels.map_batches(tag_lab, batch_format="pyarrow")
        .union(src.map_batches(tag_src, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(src_kernel, batch_format="pyarrow"),
        "source",
        {"n_docs": ("sum", "n_docs"), "n_dup_dropped": ("sum", "n_dropped")},
        n_parts=8,
    ).to_pandas()
    if len(agg) == 0:
        return pa.table({c: pa.array([], t) for c, t in spec.items()})
    agg = agg.sort_values("source", ignore_index=True)
    n = agg["n_docs"].to_numpy(np.int64)
    dr = agg["n_dup_dropped"].to_numpy(np.int64)
    return pa.table(
        {
            "source": pa.array(agg["source"].to_numpy(dtype=object), pa.string()),
            "n_docs": pa.array(n, pa.int64()),
            "n_dup_dropped": pa.array(dr, pa.int64()),
            "dup_rate": pa.array(
                np.round(dr / np.maximum(n, 1), 6), pa.float64()
            ),
        }
    )


SQL_DEDUP_RATE_BY_SOURCE = f"""
SELECT coalesce(d.source, '') AS source,
       count(*)::BIGINT AS n_docs,
       sum((g.dup_group != d.doc_id)::INT)::BIGINT AS n_dup_dropped,
       round(sum((g.dup_group != d.doc_id)::INT) * 1.0 / count(*), 6)
         AS dup_rate
FROM documents d
JOIN read_parquet('{ORACLE_DIR}/minhash_groups.parquet') g USING (doc_id)
GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "url_cache_key": (q_url_cache_key, SQL_URL_CACHE_KEY),
    "url_root": (q_url_root, SQL_URL_ROOT),
    "content_type_normalize": (q_content_type_normalize, SQL_CONTENT_TYPE),
    "scheme_policy": (q_scheme_policy, SQL_SCHEME_POLICY),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "token_count": (q_token_count, SQL_TOKEN_COUNT),
    "quality_score": (q_quality_score, SQL_QUALITY),
    "doc_fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "minhash_near_dup": (q_minhash_near_dup, SQL_MINHASH_NEAR_DUP),
    "simhash": (q_simhash, SQL_SIMHASH),
    "simhash_near_dup": (q_simhash_near_dup, SQL_SIMHASH_NEAR_DUP),
    "knn_cosine": (q_knn_cosine, SQL_KNN),
    "embedding_near_dup": (q_embedding_near_dup, SQL_EMB_NEAR_DUP),
    "embedding_near_dup_lsh": (q_embedding_near_dup_lsh, SQL_EMB_NEAR_DUP_LSH),
    "ngram_jaccard_pairs": (q_ngram_jaccard_pairs, SQL_NGRAM_JACCARD),
    "knn_ivf": (q_knn_ivf, SQL_KNN),
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "events_sliding": (q_events_sliding, SQL_EVENTS_SLIDING),
    "events_sessions": (q_events_sessions, SQL_EVENTS_SESSIONS),
    "lineitem_agg": (q_lineitem_agg, SQL_LINEITEM_AGG),
    "segment_revenue": (q_segment_revenue, SQL_SEGMENT_REVENUE),
    "order_lineitem_join": (q_order_lineitem_join, SQL_ORDER_LINEITEM_JOIN),
    "events_props": (q_events_props, SQL_EVENTS_PROPS),
    "events_asof_orders": (q_events_asof_orders, SQL_EVENTS_ASOF_ORDERS),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "token_df": (q_token_df, SQL_TOKEN_DF),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
    "dsir_weights": (q_dsir_weights, SQL_DSIR_WEIGHTS),
    "logreg_quality": (q_logreg_quality, SQL_LOGREG_QUALITY),
    "vocab_coverage": (q_vocab_coverage, SQL_VOCAB_COVERAGE),
    "cms_counts": (q_cms_counts, SQL_CMS_COUNTS),
    "als_factors": (q_als_factors, SQL_ALS_FACTORS),
    "bpe_encode": (q_bpe_encode, SQL_BPE_ENCODE),
    "logreg_auc": (q_logreg_auc, SQL_LOGREG_AUC),
    "calibration_bins": (q_calibration_bins, SQL_CALIBRATION_BINS),
    "padding_waste": (q_padding_waste, SQL_PADDING_WASTE),
    "cdc_chunk_dedup": (q_cdc_chunk_dedup, SQL_CDC_CHUNK_DEDUP),
    "link_hits": (q_link_hits, SQL_LINK_HITS),
    "gopher_rules": (q_gopher_rules, SQL_GOPHER_RULES),
    "interleaved_token_budget": (
        q_interleaved_token_budget,
        SQL_INTERLEAVED_TOKEN_BUDGET,
    ),
    "source_overlap_matrix": (
        q_source_overlap_matrix,
        SQL_SOURCE_OVERLAP_MATRIX,
    ),
    "aqp_revenue_estimate": (q_aqp_revenue_estimate, SQL_AQP_REVENUE_ESTIMATE),
    "embedding_pca": (q_embedding_pca, SQL_EMBEDDING_PCA),
    "rrf_fusion": (q_rrf_fusion, SQL_RRF_FUSION),
    "markov_attribution": (q_markov_attribution, SQL_MARKOV_ATTRIBUTION),
    "kaplan_meier": (q_kaplan_meier, SQL_KAPLAN_MEIER),
    "seasonal_decompose": (q_seasonal_decompose, SQL_SEASONAL_DECOMPOSE),
    "curation_pipeline": (q_curation_pipeline, SQL_CURATION_PIPELINE),
    "word_embedding_knn": (q_word_embedding_knn, SQL_WORD_EMBEDDING_KNN),
    "curation_funnel": (q_curation_funnel, SQL_CURATION_FUNNEL),
    "sequence_entropy_rate": (
        q_sequence_entropy_rate,
        SQL_SEQUENCE_ENTROPY_RATE,
    ),
    "logreg_cv": (q_logreg_cv, SQL_LOGREG_CV),
    "conformal_interval": (q_conformal_interval, SQL_CONFORMAL_INTERVAL),
    "selfjoin_size_cms": (q_selfjoin_size_cms, SQL_SELFJOIN_SIZE_CMS),
    "chi2_features": (q_chi2_features, SQL_CHI2_FEATURES),
    "spearman_len_tokens": (q_spearman_len_tokens, SQL_SPEARMAN_LEN_TOKENS),
    "crawl_status_mix": (q_crawl_status_mix, SQL_CRAWL_STATUS_MIX),
    "source_lang_entropy": (q_source_lang_entropy, SQL_SOURCE_LANG_ENTROPY),
    "benford_audit": (q_benford_audit, SQL_BENFORD_AUDIT),
    "token_zipf_fit": (q_token_zipf_fit, SQL_TOKEN_ZIPF_FIT),
    "dup_group_size_hist": (q_dup_group_size_hist, SQL_DUP_GROUP_SIZE_HIST),
    "revenue_autocorr": (q_revenue_autocorr, SQL_REVENUE_AUTOCORR),
    "user_burstiness": (q_user_burstiness, SQL_USER_BURSTINESS),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "quality_filter_p10": (q_quality_filter_p10, SQL_QUALITY_FILTER_P10),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "repetition_ratio": (q_repetition_ratio, SQL_REPETITION),
    "top_docs_per_lang": (q_top_docs_per_lang, SQL_TOP_DOCS_PER_LANG),
    "domain_mix_weights": (q_domain_mix_weights, SQL_DOMAIN_MIX),
    "customer_no_orders": (q_customer_no_orders, SQL_CUSTOMER_NO_ORDERS),
    "events_lag_lead": (q_events_lag_lead, SQL_EVENTS_LAG_LEAD),
    "distinct_users_exact": (q_distinct_users_exact, SQL_DISTINCT_USERS),
    "approx_distinct_users": (q_approx_distinct_users, SQL_APPROX_DISTINCT_USERS),
    "label_centroids": (q_label_centroids, SQL_LABEL_CENTROIDS),
    "text_normalize": (q_text_normalize, SQL_TEXT_NORMALIZE),
    "order_lineitem_join_salted": (q_order_lineitem_join_salted, SQL_ORDER_LINEITEM_JOIN),
    "passage_dedup": (q_passage_dedup, SQL_PASSAGE_DEDUP),
    "bigram_topk": (q_bigram_topk, SQL_BIGRAM_TOPK),
    "orders_running_total": (q_orders_running_total, SQL_RUNNING_TOTAL),
    "lineitem_rollup": (q_lineitem_rollup, SQL_LINEITEM_ROLLUP),
    "customer_order_profile": (q_customer_order_profile, SQL_CUSTOMER_ORDER_PROFILE),
    "orders_with_returns": (q_orders_with_returns, SQL_ORDERS_WITH_RETURNS),
    "orders_price_histogram": (q_orders_price_histogram, SQL_ORDERS_PRICE_HISTOGRAM),
    "orders_events_window": (q_orders_events_window, SQL_ORDERS_EVENTS_WINDOW),
    "kmeans_embeddings": (q_kmeans, SQL_KMEANS),
    "semantic_dedup": (q_semantic_dedup, SQL_SEMANTIC_DEDUP),
    "knn_pq": (q_knn_pq, SQL_KNN_PQ),
    "knn_ivfpq": (q_knn_ivfpq, SQL_KNN_IVFPQ),
    "doc_char_entropy": (q_doc_char_entropy, SQL_DOC_CHAR_ENTROPY),
    "bpe_train": (q_bpe_train, SQL_BPE_TRAIN),
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "events_quantiles": (q_events_quantiles, SQL_EVENTS_QUANTILES),
    "orders_topk": (q_orders_topk, SQL_ORDERS_TOPK),
    "media_features": (q_media_features, SQL_MEDIA_FEATURES),
    "crawl_order": (q_crawl_order, SQL_CRAWL_ORDER),
    "crawl_host_profile": (q_crawl_host_profile, SQL_CRAWL_HOST_PROFILE),
    "crawl_documents": (q_crawl_documents, SQL_CRAWL_DOCUMENTS),
    "crawl_doc_pipeline": (q_crawl_doc_pipeline, SQL_CRAWL_DOC_PIPELINE),
    "crawl_media_pipeline": (q_crawl_media_pipeline, SQL_CRAWL_MEDIA_PIPELINE),
    "events_funnel": (q_events_funnel, SQL_EVENTS_FUNNEL),
    "customer_order_list": (q_customer_order_list, SQL_CUSTOMER_ORDER_LIST),
    "lineitem_variance": (q_lineitem_variance, SQL_LINEITEM_VARIANCE),
    "link_pagerank": (q_link_pagerank, SQL_LINK_PAGERANK),
    "link_components": (q_link_components, SQL_LINK_COMPONENTS),
    "events_latest": (q_events_latest, SQL_EVENTS_LATEST),
    "events_pivot": (q_events_pivot, SQL_EVENTS_PIVOT),
    "events_user_rank": (q_events_user_rank, SQL_EVENTS_USER_RANK),
    "events_mode": (q_events_mode, SQL_EVENTS_MODE),
    "users_retention": (q_users_retention, SQL_USERS_RETENTION),
    "lineitem_cube": (q_lineitem_cube, SQL_LINEITEM_CUBE),
    "event_type_pairs": (q_event_type_pairs, SQL_EVENT_TYPE_PAIRS),
    "events_unpivot": (q_events_unpivot, SQL_EVENTS_UNPIVOT),
    "daily_activity": (q_daily_activity, SQL_DAILY_ACTIVITY),
    "orders_ntile": (q_orders_ntile, SQL_ORDERS_NTILE),
    "epoch_shuffle": (q_epoch_shuffle, SQL_EPOCH_SHUFFLE),
    "corpus_mixture": (q_corpus_mixture, SQL_CORPUS_MIXTURE),
    "events_throttle": (q_events_throttle, SQL_EVENTS_THROTTLE),
    "doc_chunks": (q_doc_chunks, SQL_DOC_CHUNKS),
    "inverted_index": (q_inverted_index, SQL_INVERTED_INDEX),
    "cohort_retention": (q_cohort_retention, SQL_COHORT_RETENTION),
    "users_churn": (q_users_churn, SQL_USERS_CHURN),
    "zorder_layout": (q_zorder_layout, SQL_ZORDER_LAYOUT),
    "fuzzy_name_match": (q_fuzzy_name_match, SQL_FUZZY_NAME_MATCH),
    "purchase_attribution": (q_purchase_attribution, SQL_PURCHASE_ATTRIBUTION),
    "snapshot_diff": (q_snapshot_diff, SQL_SNAPSHOT_DIFF),
    "orders_skyline": (q_orders_skyline, SQL_ORDERS_SKYLINE),
    "events_regression": (q_events_regression, SQL_EVENTS_REGRESSION),
    "region_revenue": (q_region_revenue, SQL_REGION_REVENUE),
    "link_triangles": (q_link_triangles, SQL_LINK_TRIANGLES),
    "orders_bloom_filter": (q_orders_bloom_filter, SQL_ORDERS_BLOOM_FILTER),
    "events_gap_fill": (q_events_gap_fill, SQL_EVENTS_GAP_FILL),
    "customer_median_order": (q_customer_median_order, SQL_CUSTOMER_MEDIAN_ORDER),
    "user_active_time": (q_user_active_time, SQL_USER_ACTIVE_TIME),
    "events_moving_avg": (q_events_moving_avg, SQL_EVENTS_MOVING_AVG),
    "sliding_distinct_users": (
        q_sliding_distinct_users,
        SQL_SLIDING_DISTINCT_USERS,
    ),
    "link_khop": (q_link_khop, SQL_LINK_KHOP),
    "bigram_lm_score": (q_bigram_lm_score, SQL_BIGRAM_LM_SCORE),
    "heavy_hitter_words": (q_heavy_hitter_words, SQL_HEAVY_HITTER_WORDS),
    "shingle_jaccard_join": (q_shingle_jaccard_join, SQL_SHINGLE_JACCARD_JOIN),
    "incremental_near_dup": (q_incremental_near_dup, SQL_INCREMENTAL_NEAR_DUP),
    "weighted_sample": (q_weighted_sample, SQL_WEIGHTED_SAMPLE),
    "user_streaks": (q_user_streaks, SQL_USER_STREAKS),
    "orders_mad_outliers": (q_orders_mad_outliers, SQL_ORDERS_MAD_OUTLIERS),
    "orders_winsorized": (q_orders_winsorized, SQL_ORDERS_WINSORIZED),
    "token_novelty": (q_token_novelty, SQL_TOKEN_NOVELTY),
    "part_copurchase": (q_part_copurchase, SQL_PART_COPURCHASE),
    "event_transitions": (q_event_transitions, SQL_EVENT_TRANSITIONS),
    "user_twap": (q_user_twap, SQL_USER_TWAP),
    "embedding_stats": (q_embedding_stats, SQL_EMBEDDING_STATS),
    "type_hour_mi": (q_type_hour_mi, SQL_TYPE_HOUR_MI),
    "events_profile": (q_events_profile, SQL_EVENTS_PROFILE),
    "user_state_intervals": (q_user_state_intervals, SQL_USER_STATE_INTERVALS),
    "daily_revenue_delta": (q_daily_revenue_delta, SQL_DAILY_REVENUE_DELTA),
    "orders_percentile_rank": (
        q_orders_percentile_rank,
        SQL_ORDERS_PERCENTILE_RANK,
    ),
    "funnel_latency": (q_funnel_latency, SQL_FUNNEL_LATENCY),
    "customer_order_cadence": (
        q_customer_order_cadence,
        SQL_CUSTOMER_ORDER_CADENCE,
    ),
    "value_quantile_sketch": (q_value_quantile_sketch, None),
    "customer_rfm": (q_customer_rfm, SQL_CUSTOMER_RFM),
    "revenue_pareto": (q_revenue_pareto, SQL_REVENUE_PARETO),
    "k_anonymity": (q_k_anonymity, SQL_K_ANONYMITY),
    "impute_missing": (q_impute_missing, SQL_IMPUTE_MISSING),
    "gini_coefficient": (q_gini_coefficient, SQL_GINI_COEFFICIENT),
    "nb_token_model": (q_nb_token_model, SQL_NB_TOKEN_MODEL),
    "daily_anomalies": (q_daily_anomalies, SQL_DAILY_ANOMALIES),
    "duplicate_orders_audit": (
        q_duplicate_orders_audit,
        SQL_DUPLICATE_ORDERS_AUDIT,
    ),
    "user_coverage_audit": (q_user_coverage_audit, SQL_USER_COVERAGE_AUDIT),
    "part_return_rates": (q_part_return_rates, SQL_PART_RETURN_RATES),
    "ship_latency": (q_ship_latency, SQL_SHIP_LATENCY),
    "hapax_stats": (q_hapax_stats, SQL_HAPAX_STATS),
    "priority_price_extremes": (
        q_priority_price_extremes,
        SQL_PRIORITY_PRICE_EXTREMES,
    ),
    "adoption_curve": (q_adoption_curve, SQL_ADOPTION_CURVE),
    "merge_upsert": (q_merge_upsert, SQL_MERGE_UPSERT),
    "word_pmi": (q_word_pmi, SQL_WORD_PMI),
    "leakage_split_audit": (q_leakage_split_audit, SQL_LEAKAGE_SPLIT_AUDIT),
    "events_watermark": (q_events_watermark, SQL_EVENTS_WATERMARK),
    "embedding_quantize": (q_embedding_quantize, SQL_EMBEDDING_QUANTIZE),
    "shingle_overlap_join": (q_shingle_overlap_join, SQL_SHINGLE_OVERLAP_JOIN),
    "user_value_ewma": (q_user_value_ewma, SQL_USER_VALUE_EWMA),
    "path_trigrams": (q_path_trigrams, SQL_PATH_TRIGRAMS),
    "embedding_gram": (q_embedding_gram, SQL_EMBEDDING_GRAM),
    "source_kl_divergence": (q_source_kl_divergence, SQL_SOURCE_KL_DIVERGENCE),
    "link_degree_stats": (q_link_degree_stats, SQL_LINK_DEGREE_STATS),
    "media_payload_dedup": (q_media_payload_dedup, SQL_MEDIA_PAYLOAD_DEDUP),
    "diversified_topk": (q_diversified_topk, SQL_DIVERSIFIED_TOPK),
    "redirect_aliases": (q_redirect_aliases, SQL_REDIRECT_ALIASES),
    "revenue_trend_theilsen": (
        q_revenue_trend_theilsen,
        SQL_REVENUE_TREND_THEILSEN,
    ),
    "revenue_backtest": (q_revenue_backtest, SQL_REVENUE_BACKTEST),
    "langid_confusion": (q_langid_confusion, SQL_LANGID_CONFUSION),
    "shingle_dup_fraction": (q_shingle_dup_fraction, SQL_SHINGLE_DUP_FRACTION),
    "corpus_datacard": (q_corpus_datacard, SQL_CORPUS_DATACARD),
    "segment_ttest": (q_segment_ttest, SQL_SEGMENT_TTEST),
    "lineitem_corr": (q_lineitem_corr, SQL_LINEITEM_CORR),
    "ngram_repetition_share": (
        q_ngram_repetition_share,
        SQL_NGRAM_REPETITION_SHARE,
    ),
    "token_fertility_by_lang": (
        q_token_fertility_by_lang,
        SQL_TOKEN_FERTILITY_BY_LANG,
    ),
    "unigram_surprisal": (q_unigram_surprisal, SQL_UNIGRAM_SURPRISAL),
    "dup_cluster_quality": (q_dup_cluster_quality, SQL_DUP_CLUSTER_QUALITY),
    "curation_packed": (q_curation_packed, SQL_CURATION_PACKED),
    "dedup_rate_by_source": (q_dedup_rate_by_source, SQL_DEDUP_RATE_BY_SOURCE),
}
