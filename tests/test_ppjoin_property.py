"""Property tests for the exact set-similarity join family
(functions/dedup.py shingle_jaccard_pairs): random corpora vs the
brute-force all-pairs twin, asserting EXACT equality — the prefix-filter
lemma (and the overlap variant's asymmetric pigeonhole) must never lose
or invent a pair at any threshold.

Derandomized (hypothesis ``derandomize=True`` — the seed is pinned by
the strategy definitions themselves), so failures replay exactly.
"""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from anansi_ray.functions.dedup import shingle_jaccard_pairs

# a tiny vocabulary makes shingle collisions (and hence candidate pairs)
# common: every property run exercises the verify kernel, not just the
# empty-result path
_VOCAB = ["aa", "bb", "cc", "dd", "ee"]

_texts = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=9).map(" ".join),
    min_size=2,
    max_size=10,
)

_thresholds = st.sampled_from([(6, 10), (8, 10), (1, 2), (9, 10)])


def _brute(texts, t_num, t_den, k, sim, cross=None):
    sets = {}
    for i, t in enumerate(texts):
        ws = re.findall(r"\w+", t.lower())
        sh = {" ".join(ws[j : j + k]) for j in range(len(ws) - k + 1)}
        if sh:
            sets[i] = sh
    rows = []
    for a in sorted(sets):
        for b in sorted(sets):
            if b <= a:
                continue
            if cross is not None and cross(a) == cross(b):
                continue
            inter = len(sets[a] & sets[b])
            if sim == "jaccard":
                denom = len(sets[a] | sets[b])
            else:  # overlap coefficient
                denom = min(len(sets[a]), len(sets[b]))
            if t_den * inter >= t_num * denom:
                rows.append((a, b, round(inter / denom, 6)))
    col = sim if sim == "jaccard" else "overlap"
    return (
        pd.DataFrame(rows, columns=["a", "b", col])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype({"a": "int64", "b": "int64"})
    )


def _run(texts, t_num, t_den, k, sim, new_pred=None):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = shingle_jaccard_pairs(
        ds, t_num=t_num, t_den=t_den, k=k, sim=sim, new_pred=new_pred
    )
    col = sim if sim == "jaccard" else "overlap"
    if got is None:
        return pd.DataFrame(columns=["a", "b", col]).astype(
            {"a": "int64", "b": "int64", col: "float64"}
        )
    return (
        got.to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype({"a": "int64", "b": "int64"})
    )


class TestPPJoinProperty:
    @settings(max_examples=12, deadline=None, derandomize=True)
    @given(texts=_texts, th=_thresholds)
    def test_jaccard_exact_vs_brute(self, texts, th):
        t_num, t_den = th
        got = _run(texts, t_num, t_den, 2, "jaccard")
        want = _brute(texts, t_num, t_den, 2, "jaccard")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    @settings(max_examples=12, deadline=None, derandomize=True)
    @given(texts=_texts, th=_thresholds)
    def test_overlap_exact_vs_brute(self, texts, th):
        # the containment variant's ASYMMETRIC prefix lemma: only the
        # smaller side is pigeonholed, so completeness is the property
        # most worth fuzzing (a symmetric-prefix bug loses contained docs)
        t_num, t_den = th
        got = _run(texts, t_num, t_den, 2, "overlap")
        want = _brute(texts, t_num, t_den, 2, "overlap")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(texts=_texts)
    def test_cross_only_pred_vs_brute(self, texts):
        # incremental-ingest shape: only cross (new x corpus) pairs emit
        pred = lambda ids: (np.asarray(ids) % 3 == 0)
        got = _run(texts, 6, 10, 2, "jaccard", new_pred=pred)
        want = _brute(texts, 6, 10, 2, "jaccard", cross=lambda i: i % 3 == 0)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    @settings(max_examples=6, deadline=None, derandomize=True)
    @given(texts=_texts, k=st.sampled_from([1, 3]))
    def test_shingle_width_vs_brute(self, texts, k):
        got = _run(texts, 6, 10, k, "jaccard")
        want = _brute(texts, 6, 10, k, "jaccard")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
