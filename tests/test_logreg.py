"""Distributed logistic regression (functions/logreg.py): the GD
partial-sum path must land on the sequential twin bit-for-bit across
block layouts (the rounded-weight contract), and the classifier must
actually separate a separable corpus."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anansi_ray.functions.logreg import logreg_distributed, logreg_local


def _docs(n=200, seed=31):
    rng = np.random.default_rng(seed)
    texts, langs = [], []
    for i in range(n):
        en = i % 2 == 0
        if en:
            # longer docs, more stopwords
            words = ["the", "a", "data", "table", "merge"] * rng.integers(4, 9)
        else:
            words = ["uno", "dos", "tres"] * rng.integers(1, 3)
        rng.shuffle(words)
        texts.append(" ".join(words))
        langs.append("en" if en else "xx")
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestLogReg:
    def test_distributed_matches_local_across_block_layouts(self):
        t = _docs()
        exp = logreg_local(t).to_pandas()
        for nb in (1, 4, 9):
            got = logreg_distributed(
                rd.from_arrow(t).repartition(nb)
            ).to_pandas()
            assert got.equals(exp), f"mismatch at nblocks={nb}"

    def test_separable_corpus_is_separated(self):
        out = logreg_local(_docs()).to_pandas()
        acc = (out["label"] == out["pred"]).mean()
        assert acc >= 0.95

    def test_probabilities_bounded_and_rounded(self):
        out = logreg_local(_docs(n=60)).to_pandas()
        p = out["prob"].to_numpy()
        assert ((p >= 0) & (p <= 1)).all()
        assert np.allclose(p, np.round(p, 6))

    def test_empty_corpus(self):
        t = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
            }
        )
        assert logreg_local(t).num_rows == 0
        assert logreg_distributed(rd.from_arrow(t)).num_rows == 0

    def test_degenerate_single_class(self):
        # all-one-class corpus must still converge (toward p -> 1)
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(10), pa.int64()),
                "text": pa.array(["the a data"] * 10, pa.string()),
                "lang": pa.array(["en"] * 10, pa.string()),
            }
        )
        out = logreg_local(t).to_pandas()
        assert (out["prob"] > 0.5).all()


@pytest.mark.usefixtures("ray_session")
class TestLogRegCV:
    def test_distributed_matches_local_across_layouts(self):
        from anansi_ray.functions.logreg import (
            logreg_cv_distributed,
            logreg_cv_local,
        )

        t = _docs(n=120)
        exp = logreg_cv_local(t).to_pandas()
        for nb in (1, 5):
            got = logreg_cv_distributed(
                rd.from_arrow(t).repartition(nb)
            ).to_pandas()
            assert got.equals(exp), f"mismatch at nblocks={nb}"

    def test_fold_accounting(self):
        from anansi_ray.functions.logreg import CV_FOLDS, logreg_cv_local

        t = _docs(n=90)
        out = logreg_cv_local(t).to_pandas()
        assert len(out) == CV_FOLDS
        assert (out["n_train"] + out["n_test"] == 90).all()
        assert ((out["accuracy"] >= 0) & (out["accuracy"] <= 1)).all()
        # separable corpus: every fold generalizes
        assert (out["accuracy"] >= 0.9).all()
