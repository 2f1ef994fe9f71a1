"""BPE vocabulary induction (functions/bpe.py) and per-doc byte entropy
(functions/text.py char_entropy_batch)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anansi_ray.functions.bpe import (
    bpe_merge_loop,
    top_words,
    topv_partial,
    word_count_partial,
)
from anansi_ray.functions.text import char_entropy_batch


class TestBpeLoop:
    def test_hand_case_abab(self):
        # "abab"x3: a-b count 6, b-a count 3 -> merge (a,b); then the two
        # ab symbols pair 3 times -> merge (ab,ab); then no pairs remain
        out = bpe_merge_loop([("abab", 3)], n_merges=10).to_pydict()
        assert out["merge_rank"] == [1, 2]
        assert out["left"] == ["a", "ab"]
        assert out["right"] == ["b", "ab"]
        assert out["merged"] == ["ab", "abab"]
        assert out["pair_count"] == [6, 3]

    def test_tiebreak_lexicographic(self):
        out = bpe_merge_loop([("ab", 1), ("cd", 1)], n_merges=2).to_pydict()
        assert (out["left"][0], out["right"][0]) == ("a", "b")
        assert (out["left"][1], out["right"][1]) == ("c", "d")

    def test_merged_is_concatenation_and_counts_positive(self):
        out = bpe_merge_loop(
            [("lowlow", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
            n_merges=8,
        )
        for l, r, m, c in zip(
            out["left"].to_pylist(),
            out["right"].to_pylist(),
            out["merged"].to_pylist(),
            out["pair_count"].to_pylist(),
        ):
            assert m == l + r
            assert c > 0

    def test_empty_and_single_char_words(self):
        assert bpe_merge_loop([]).num_rows == 0
        assert bpe_merge_loop([("a", 5), ("b", 3)]).num_rows == 0

    def test_top_words_cut_deterministic(self):
        pairs = [("b", 5), ("a", 5), ("c", 9)]
        assert top_words(pairs, v=2) == [("c", 9), ("a", 5)]


@pytest.mark.usefixtures("ray_session")
class TestBpeDistributed:
    def test_matches_sequential_counting_across_layouts(self):
        texts = [
            "the cat sat on the mat",
            "the dog sat on the log",
            "cats and dogs and cats",
            "",
        ] * 5
        t = pa.table({"text": pa.array(texts, pa.string())})
        # sequential reference: plain python word counts -> same pure loop
        from collections import Counter

        cnt = Counter(w for s in texts for w in s.split(" ") if w)
        exp = bpe_merge_loop(top_words(list(cnt.items()))).to_pandas()

        from anansi_ray.arrowds import coarse_agg

        for nblocks in (1, 4):
            ds = rd.from_arrow(t).repartition(nblocks)
            counts = coarse_agg(
                ds.map_batches(word_count_partial, batch_format="pyarrow"),
                "word",
                {"cnt": ("sum", "cnt")},
            )
            parts = counts.map_batches(
                topv_partial, batch_format="pyarrow"
            ).to_pandas()
            got = bpe_merge_loop(
                top_words(list(zip(parts["word"].astype(str), parts["cnt"].astype(int))))
            ).to_pandas()
            assert got.equals(exp), f"mismatch at nblocks={nblocks}"


class TestCharEntropy:
    def test_hand_values(self):
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": ["aabb", "", "abcd", None],
            }
        )
        out = char_entropy_batch(t).to_pydict()
        assert out["n_bytes"] == [4, 0, 4, 0]
        assert out["entropy"] == [1.0, 0.0, 2.0, 0.0]

    def test_uniform_three_symbols(self):
        t = pa.table({"doc_id": pa.array([7], pa.int64()), "text": ["abcabc"]})
        out = char_entropy_batch(t).to_pydict()
        assert out["entropy"][0] == round(math.log2(3), 6)

    def test_sliced_column_offsets(self):
        # a sliced Arrow column has a non-zero offset into shared buffers;
        # the kernel must read the right window
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": ["zzzz", "aabb", "abcd", "qq"],
            }
        )
        sl = t.slice(1, 2)
        out = char_entropy_batch(sl).to_pydict()
        assert out["doc_id"] == [2, 3]
        assert out["entropy"] == [1.0, 2.0]

    def test_matches_numpy_reference_random(self):
        rng = np.random.default_rng(4)
        texts = [
            "".join(rng.choice(list("abcdefg "), size=rng.integers(0, 60)))
            for _ in range(50)
        ]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(50), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = char_entropy_batch(t).to_pydict()
        for s, e, n in zip(texts, out["entropy"], out["n_bytes"]):
            assert n == len(s)
            if len(s) == 0:
                assert e == 0.0
                continue
            _, counts = np.unique(list(s), return_counts=True)
            p = counts / len(s)
            assert e == round(float(-(p * np.log2(p)).sum()), 6)


@pytest.mark.usefixtures("ray_session")
class TestBpeEncode:
    def test_encode_word_applies_merges_in_rank_order(self):
        from anansi_ray.functions.bpe import encode_word

        # merges: (a,b)->ab then (ab,c)->abc
        merges = [("a", "b"), ("ab", "c")]
        assert encode_word("abc", merges) == 1
        assert encode_word("acb", merges) == 3
        assert encode_word("ababc", merges) == 2  # ab + abc
        assert encode_word("", merges) == 0
        assert encode_word("x", merges) == 1

    def test_batch_stats_and_memo(self):
        import pyarrow as pa

        from anansi_ray.functions.bpe import bpe_encode_batch

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["ab ab cd", "", "ab"], pa.string()),
            }
        )
        out = bpe_encode_batch(t, [("a", "b")]).to_pandas()
        assert list(out["n_words"]) == [3, 0, 1]
        assert list(out["n_pieces"]) == [4, 0, 1]  # ab->1 piece, cd->2
        assert out["ratio"].iloc[1] == 0.0

    def test_query_layout_invariance(self):
        import numpy as np
        import pyarrow as pa
        import ray
        import ray.data as rd

        from anansi_ray.functions.bpe import bpe_encode_batch

        rng = np.random.default_rng(3)
        texts = [
            " ".join(rng.choice(["low", "lower", "lowest", "new", "newer"], 10))
            for _ in range(60)
        ]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(60), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        merges = [("l", "o"), ("lo", "w"), ("e", "r")]
        mref = ray.put(merges)
        outs = []
        for nb in (1, 5):
            out = (
                rd.from_arrow(t)
                .repartition(nb)
                .map_batches(
                    lambda b: bpe_encode_batch(b, ray.get(mref)),
                    batch_format="pyarrow",
                )
                .to_pandas()
                .sort_values("doc_id", ignore_index=True)
            )
            outs.append(out)
        assert outs[0].equals(outs[1])
