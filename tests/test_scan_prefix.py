"""Distributed prefix scan + passage dedup + bigram combiner tests."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from anansi_ray.functions.dedup import passage_dedup, passage_explode
from anansi_ray.functions.scan import ordered_prefix_sum
from anansi_ray.functions.text import bigram_partial


def _scan_ref(keys: np.ndarray, ids: np.ndarray, vals: np.ndarray) -> pd.DataFrame:
    """Sequential reference: cumsum over the (key, id) sort order."""
    order = np.lexsort((ids, keys))
    run = np.cumsum(vals[order])
    return (
        pd.DataFrame({"id": ids[order], "running": run})
        .sort_values("id")
        .reset_index(drop=True)
    )


class TestOrderedPrefixSum:
    @pytest.mark.parametrize("n,card", [(10_000, 300), (500, 3), (64, 64)])
    def test_matches_sequential_cumsum(self, ray_session, n, card):
        import ray.data as rd

        rng = np.random.default_rng(n)
        keys = rng.integers(0, card, n).astype(np.int64)
        ids = rng.permutation(n).astype(np.int64)
        vals = rng.integers(-1000, 1000, n).astype(np.int64)
        ds = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array(keys, pa.int64()),
                    "id": pa.array(ids, pa.int64()),
                    "v": pa.array(vals, pa.int64()),
                }
            )
        ).repartition(7)
        out = (
            ordered_prefix_sum(
                ds, "k", ["k", "id"], "v", keep_cols=["id"], out_col="running",
                n_parts=8,
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        ref = _scan_ref(keys, ids, vals)
        assert (out["id"].to_numpy() == ref["id"].to_numpy()).all()
        assert (out["running"].to_numpy() == ref["running"].to_numpy()).all()

    def test_skewed_range_key(self, ray_session):
        """One range key holding 90% of rows must still be exact (it lands
        in one part; boundaries are equal-count over DISTINCT keys so the
        hot key can't straddle two parts)."""
        import ray.data as rd

        n = 5000
        rng = np.random.default_rng(1)
        keys = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 50, n)).astype(
            np.int64
        )
        ids = np.arange(n, dtype=np.int64)
        vals = rng.integers(0, 100, n).astype(np.int64)
        ds = rd.from_arrow(
            pa.table({"k": keys, "id": ids, "v": vals})
        ).repartition(5)
        out = (
            ordered_prefix_sum(ds, "k", ["k", "id"], "v", ["id"], "running", 8)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        ref = _scan_ref(keys, ids, vals)
        assert (out["running"].to_numpy() == ref["running"].to_numpy()).all()


def _passage_ref(doc_ids, texts, w=3):
    """Sequential reference: first global occurrence per chunk, in
    (doc_id, ci) order, reassembled."""
    seen = {}
    for did in sorted(doc_ids):
        words = texts[doc_ids.index(did)].split(" ")
        for ci in range(0, (len(words) + w - 1) // w):
            chunk = " ".join(words[ci * w : (ci + 1) * w])
            seen.setdefault(chunk, (did, ci))
    out = {}
    for chunk, (did, ci) in seen.items():
        out.setdefault(did, []).append((ci, chunk))
    return {
        did: " ".join(c for _, c in sorted(chunks)) for did, chunks in out.items()
    }


class TestPassageDedup:
    def test_explode_shapes(self):
        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["a b c d e", "a b c"],
            }
        )
        out = passage_explode(t, chunk_words=3).to_pandas()
        assert sorted(out["chunk"]) == ["a b c", "a b c", "d e"]
        assert set(out["order_key"]) == {
            "000000000001:000000",
            "000000000001:000001",
            "000000000002:000000",
        }

    def test_dedup_matches_reference(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(5)
        vocab = ["x", "y", "z", "w"]
        doc_ids = list(range(40))
        texts = [
            " ".join(rng.choice(vocab, rng.integers(3, 15)).tolist())
            for _ in doc_ids
        ]
        ds = rd.from_arrow(
            pa.table(
                {"doc_id": pa.array(doc_ids, pa.int64()), "text": texts}
            )
        ).repartition(4)
        got = (
            passage_dedup(ds, chunk_words=3, n_parts=4)
            .to_pandas()
            .set_index("doc_id")["text"]
            .to_dict()
        )
        assert got == _passage_ref(doc_ids, texts, w=3)


class TestBigramPartial:
    def test_counts_and_no_cross_doc_pairs(self):
        t = pa.table({"text": ["a b a b", "b a"]})
        out = bigram_partial(t).to_pandas().set_index("bigram")["n"].to_dict()
        # "b|a" across the doc boundary must NOT count
        assert out == {"a b": 2, "b a": 2}

    def test_empty_and_single_word(self):
        t = pa.table({"text": ["solo", ""]})
        out = bigram_partial(t)
        assert out.num_rows == 0
