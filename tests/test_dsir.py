"""DSIR importance weights (functions/dsir.py): block-layout invariance
(corpus stats are merged from per-batch partials — the λ table must not
depend on batching), sign sanity (target-typical docs score higher), and
degenerate shapes."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anansi_ray.functions.dsir import dsir_weights


def _docs(texts, langs):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestDSIR:
    def test_block_layout_invariant(self):
        rng = np.random.default_rng(23)
        vocab_en = ["alpha", "beta", "gamma", "delta"]
        vocab_xx = ["uno", "dos", "tres", "cuatro"]
        texts, langs = [], []
        for i in range(180):
            en = i % 3 != 0
            v = vocab_en if en else vocab_xx
            texts.append(" ".join(rng.choice(v, size=rng.integers(2, 30))))
            langs.append("en" if en else "xx")
        t = _docs(texts, langs)
        outs = [
            dsir_weights(rd.from_arrow(t).repartition(nb)).to_pandas()
            for nb in (1, 4, 9)
        ]
        assert outs[0].equals(outs[1]) and outs[0].equals(outs[2])

    def test_target_typical_docs_score_higher(self):
        # docs made of target-only vocabulary must outscore docs made of
        # non-target vocabulary (that's the whole point of DSIR)
        texts = ["alpha beta alpha beta"] * 6 + ["uno dos uno dos"] * 6
        langs = ["en"] * 6 + ["xx"] * 6
        out = dsir_weights(rd.from_arrow(_docs(texts, langs))).to_pandas()
        en_w = out[out["doc_id"] < 6]["logw"].mean()
        xx_w = out[out["doc_id"] >= 6]["logw"].mean()
        assert en_w > xx_w

    def test_feature_count(self):
        # n_feats = unigrams + adjacent bigrams = n + (n-1)
        out = dsir_weights(
            rd.from_arrow(_docs(["a b c d", "", "solo"], ["en", "en", "xx"]))
        ).to_pandas()
        assert list(out["n_feats"]) == [7, 0, 1]
        assert out[out["doc_id"] == 1]["logw"].iloc[0] == 0.0

    def test_empty_corpus(self):
        out = dsir_weights(rd.from_arrow(_docs([], [])))
        assert out.num_rows == 0
        assert out.column_names == ["doc_id", "n_feats", "logw"]

    def test_no_target_docs_still_defined(self):
        # smoothing keeps λ finite when the target partition is empty
        out = dsir_weights(
            rd.from_arrow(_docs(["a b", "c d"], ["xx", "yy"]))
        ).to_pandas()
        assert np.isfinite(out["logw"]).all()
