"""BM25 top-k (functions/bm25.py): block-layout invariance (the partial
top-k + driver rank merge must not depend on batching), ranking sanity,
and the score>0 candidate contract."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anansi_ray.functions.bm25 import BM25_QUERIES, BM25_TOPK, bm25_topk


def _docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestBM25:
    def test_block_layout_invariant(self):
        rng = np.random.default_rng(7)
        vocab = ["hash", "join", "merge", "window", "sort", "order",
                 "stream", "batch", "data", "the", "a", "row", "scan"]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(3, 40)))
            for _ in range(240)
        ]
        t = _docs(texts)
        outs = []
        for nblocks in (1, 4, 9):
            ds = rd.from_arrow(t).repartition(nblocks)
            outs.append(bm25_topk(ds).to_pandas().reset_index(drop=True))
        assert outs[0].equals(outs[1]) and outs[0].equals(outs[2])

    def test_ranking_monotone_and_topk(self):
        texts = ["hash join merge " * (i + 1) for i in range(30)]
        out = bm25_topk(rd.from_arrow(_docs(texts))).to_pandas()
        for _, grp in out.groupby("query_id"):
            assert list(grp["rank"]) == list(range(1, len(grp) + 1))
            assert len(grp) <= BM25_TOPK
            s = grp["score"].to_numpy()
            assert (np.diff(s) <= 0).all()

    def test_only_matching_docs_are_candidates(self):
        # docs with no query terms never appear; a query whose terms are
        # absent from the corpus returns nothing
        texts = ["hash hash hash", "nothing relevant here", "xyzzy plugh"]
        out = bm25_topk(rd.from_arrow(_docs(texts))).to_pandas()
        assert set(out["doc_id"]) == {0}
        assert set(out["query_id"]) == {1}

    def test_exhaustive_tf_saturation(self):
        # BM25 tf saturation: 100 repeats must not score 100x one repeat
        texts = ["hash", "hash " * 100]
        out = bm25_topk(rd.from_arrow(_docs(texts))).to_pandas()
        q1 = out[out["query_id"] == 1].set_index("doc_id")["score"]
        assert q1[1] > q1[0]
        assert q1[1] < 3 * q1[0]

    def test_empty_and_no_token_docs(self):
        out = bm25_topk(rd.from_arrow(_docs(["", "   ", "hash"]))).to_pandas()
        assert set(out["doc_id"]) == {2}
        empty = _docs([])
        assert bm25_topk(rd.from_arrow(empty)).num_rows == 0

    def test_null_text_rows(self):
        # NULL text must behave as empty (the SQL twins coalesce) — this
        # crashed before the fill_null fix
        import pyarrow as pa

        from anansi_ray.functions.bm25 import _doc_term_counts
        from anansi_ray.functions.dsir import _features
        from anansi_ray.functions.logreg import _features as lr_features

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["hash join", None], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
            }
        )
        dl, tf = _doc_term_counts(t)
        assert dl[1] == 0
        fp, bk, nf = _features(t)
        assert nf[1] == 0
        X = lr_features(t)
        assert X[1, 1] == 0.0
