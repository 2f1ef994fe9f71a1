"""Epoch-shuffle and corpus-mixture curation operators: permutation /
determinism / expectation properties pinned on hand-built documents
tables (the DuckDB value twins run in the check_queries gate; these pin
the engine-side invariants without an oracle)."""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from anansi_ray.pipelines.queries import q_corpus_mixture, q_epoch_shuffle

SF0001 = "/root/testdata/sf0.001"


def _docs(tmp_path, n_per_source):
    """Build a documents.parquet with the given {source: n_docs} layout."""
    ids, srcs = [], []
    i = 0
    for src, n in n_per_source.items():
        for _ in range(n):
            ids.append(i)
            srcs.append(src)
            i += 1
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([f"doc {j}" for j in ids], pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array([5] * len(ids), pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return tbl


class TestEpochShuffle:
    def test_is_permutation(self, ray_session):
        out = q_epoch_shuffle(SF0001).to_pandas()
        n = len(out)
        assert sorted(out["pos"]) == list(range(1, n + 1))
        assert out["doc_id"].is_unique

    def test_matches_sequential_twin(self, ray_session, tmp_path):
        _docs(tmp_path, {"a": 37, "b": 11})
        out = q_epoch_shuffle(str(tmp_path)).to_pandas()
        # sequential twin: sort ids by (md5 hex of "<id>-ep42", id)
        ids = out["doc_id"].to_numpy()
        key = {
            int(i): hashlib.md5(f"{i}-ep42".encode()).hexdigest() for i in ids
        }
        expected_order = sorted(ids, key=lambda i: (key[int(i)], int(i)))
        pos_of = dict(zip(out["doc_id"], out["pos"]))
        for rank, i in enumerate(expected_order, start=1):
            assert pos_of[i] == rank

    def test_deterministic_across_runs(self, ray_session):
        a = q_epoch_shuffle(SF0001).to_pandas()
        b = q_epoch_shuffle(SF0001).to_pandas()
        assert a.equals(b)


class TestCorpusMixture:
    def test_heavy_source_downsampled_small_kept(self, ray_session, tmp_path):
        _docs(tmp_path, {"heavy": 400, "light": 20})
        out = q_corpus_mixture(str(tmp_path)).to_pandas()
        kept = out.groupby("source").size()
        # cap = total/(2*S) = 420/4 = 105 expected per source: the heavy
        # source must be cut hard (rate 105/400), the light one kept whole
        # (rate >= 1 -> threshold covers the full 32-bit space)
        assert kept.get("light", 0) == 20
        assert 40 <= kept.get("heavy", 0) <= 180  # 105 expected, binomial
        # verdicts are per-doc deterministic: same seeded hash rule
        thr = ((1 << 32) * 420) // (2 * 2 * 400)
        for doc_id in out[out["source"] == "heavy"]["doc_id"]:
            v = int.from_bytes(
                hashlib.md5(f"{doc_id}-mix-heavy".encode()).digest()[:4], "big"
            )
            assert v < thr

    def test_balanced_corpus_halved(self, ray_session, tmp_path):
        _docs(tmp_path, {"a": 200, "b": 200})
        out = q_corpus_mixture(str(tmp_path)).to_pandas()
        # keep rate 1/2 per source in expectation
        assert 120 <= len(out) <= 280
        assert set(out["source"]) == {"a", "b"}

    def test_verdict_stable_under_corpus_growth(self, ray_session, tmp_path):
        """A surviving doc's verdict depends only on its own source's keep
        rate — adding a NEW source (which leaves every existing source's
        n and the mean cap ratio total/(S*n_s) unchanged) must not flip
        any existing verdict."""
        _docs(tmp_path, {"a": 100, "b": 100})
        before = q_corpus_mixture(str(tmp_path)).to_pandas()
        _docs(tmp_path, {"a": 100, "b": 100, "c": 100})
        after = q_corpus_mixture(str(tmp_path)).to_pandas()
        kept_a_before = set(before[before["source"] == "a"]["doc_id"])
        kept_a_after = set(after[after["source"] == "a"]["doc_id"])
        assert kept_a_before == kept_a_after
