"""Property test for the distributed curation composition: on random
corpora, the one-exchange first-drop-wins disposition must equal the
composition recomputed from the INDEPENDENT stage queries (the r4
driver-side semantics, kept here as the reference twin).

Derandomized; each example writes its corpus to a fresh sf_dir so the
per-process memos (_CURATION_MEMO, _LR_*, _CC_LABELS_MEMO) never leak
between examples.
"""

import hashlib
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

# vocab rich enough to trip every stage: stopwords (gopher), repeated
# phrases (exact + near dup), lang markers (logreg features)
_WORDS = ["the", "a", "data", "pipeline", "crawl", "und", "der", "les"]

_corpus = st.lists(
    st.tuples(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join),
        st.sampled_from(["en", "de", "fr"]),
    ),
    min_size=1,
    max_size=14,
)


def _write_sf(rows) -> str:
    d = tempfile.mkdtemp(prefix="curation_prop_")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array([t for t, _ in rows], pa.string()),
                "lang": pa.array([l for _, l in rows], pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def _expected(sf_dir: str) -> pd.DataFrame:
    """The r4 reference composition: merge the independent stage queries
    on the driver and apply the stage-order cascade."""
    from anansi_ray.pipelines.queries import (
        q_gopher_rules,
        q_logreg_quality,
        q_minhash_near_dup,
    )

    gopher = q_gopher_rules(sf_dir).to_pandas()[["doc_id", "keep"]]
    groups = q_minhash_near_dup(sf_dir).to_pandas()
    quality = q_logreg_quality(sf_dir).to_pandas()[["doc_id", "pred"]]
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    fp = docs[["doc_id"]].copy()
    fp["text_hash"] = [
        hashlib.sha256((t or "").encode()).hexdigest()[:32]
        for t in docs["text"]
    ]
    keeper = fp.groupby("text_hash")["doc_id"].transform("min")
    fp["exact_dropped"] = (fp["doc_id"] != keeper).astype(int)
    df = (
        fp[["doc_id", "exact_dropped"]]
        .merge(gopher, on="doc_id")
        .merge(groups, on="doc_id")
        .merge(quality, on="doc_id")
        .sort_values("doc_id", ignore_index=True)
    )
    disp = np.where(
        df["keep"] == 0,
        "gopher",
        np.where(
            df["exact_dropped"] == 1,
            "exact_dup",
            np.where(
                df["dup_group"] != df["doc_id"],
                "near_dup",
                np.where(df["pred"] == 0, "quality", "kept"),
            ),
        ),
    )
    return pd.DataFrame(
        {"doc_id": df["doc_id"].astype("int64"), "disposition": disp}
    )


class TestCurationComposition:
    @settings(max_examples=5, deadline=None, derandomize=True)
    @given(rows=_corpus)
    def test_first_drop_wins_vs_stage_queries(self, ray_session, rows):
        from anansi_ray.pipelines.queries import (
            q_curation_funnel,
            q_curation_pipeline,
        )

        sf = _write_sf(rows)
        got = q_curation_pipeline(sf).to_pandas()
        want = _expected(sf)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )
        # funnel must be the exact groupby of the disposition table
        fun = q_curation_funnel(sf).to_pandas()
        exp = (
            want.groupby("disposition", sort=True)
            .size()
            .rename("n_docs")
            .reset_index()
        )
        exp["share"] = (exp["n_docs"] / exp["n_docs"].sum()).round(6)
        pd.testing.assert_frame_equal(
            fun.reset_index(drop=True),
            exp.astype({"n_docs": "int64"}),
            check_dtype=False,
        )

    def test_empty_corpus(self, ray_session):
        from anansi_ray.pipelines.queries import (
            q_curation_funnel,
            q_curation_pipeline,
        )

        sf = _write_sf([])
        assert q_curation_pipeline(sf).num_rows == 0
        assert q_curation_funnel(sf).num_rows == 0
