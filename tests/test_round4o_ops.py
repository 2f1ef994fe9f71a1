"""Round-4 session-4 primitives: the ordered watermark scan (exclusive
running max with cross-part carry) against a sequential reference, and the
containment (overlap-coefficient) join on pairs Jaccard structurally
misses."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from anansi_ray.functions.dedup import shingle_jaccard_pairs
from anansi_ray.functions.scan import WM_SENTINEL, ordered_watermark


def _wm_ref(at: np.ndarray, ids: np.ndarray, t: np.ndarray) -> pd.DataFrame:
    """Sequential reference: exclusive running max of t over (at, id)."""
    order = np.lexsort((ids, at))
    ts = t[order]
    hi = np.empty(len(ts), np.int64)
    valid = np.ones(len(ts), bool)
    if len(ts):
        hi[0], valid[0] = WM_SENTINEL, False
        hi[1:] = np.maximum.accumulate(ts)[:-1]
    return (
        pd.DataFrame({"id": ids[order], "hi": hi, "valid": valid})
        .sort_values("id")
        .reset_index(drop=True)
    )


class TestOrderedWatermark:
    @pytest.mark.parametrize("n,card", [(10_000, 200), (500, 2), (64, 64)])
    def test_matches_sequential_exclusive_max(self, ray_session, n, card):
        import ray.data as rd

        rng = np.random.default_rng(n)
        at = rng.integers(0, card, n).astype(np.int64)
        ids = rng.permutation(n).astype(np.int64)
        t = rng.integers(-10_000, 10_000, n).astype(np.int64)
        ds = rd.from_arrow(
            pa.table(
                {
                    "at": pa.array(at, pa.int64()),
                    "id": pa.array(ids, pa.int64()),
                    "t": pa.array(t, pa.int64()),
                }
            )
        ).repartition(7)
        out = (
            ordered_watermark(
                ds,
                range_col="at",
                order_cols=["at", "id"],
                ts_col="t",
                keep_cols=["id"],
                n_parts=5,
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        ref = _wm_ref(at, ids, t)
        assert (out["id"].to_numpy() == ref["id"].to_numpy()).all()
        assert (out["wm_hi"].to_numpy() == ref["hi"].to_numpy()).all()
        assert (out["wm_valid"].to_numpy() == ref["valid"].to_numpy()).all()

    def test_single_row(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table(
                {
                    "at": pa.array([5], pa.int64()),
                    "id": pa.array([1], pa.int64()),
                    "t": pa.array([99], pa.int64()),
                }
            )
        )
        out = ordered_watermark(
            ds, range_col="at", order_cols=["at", "id"], ts_col="t",
            keep_cols=["id"],
        ).to_pandas()
        assert len(out) == 1
        assert not bool(out["wm_valid"][0])
        assert int(out["wm_hi"][0]) == WM_SENTINEL


class TestContainmentJoin:
    def test_finds_contained_doc_jaccard_misses(self, ray_session):
        """A 5-word quote inside a 200-word host doc: overlap = 1.0 but
        Jaccard ≈ 3/200 — the containment join must report the pair, the
        Jaccard join must not."""
        import ray.data as rd

        quote = "the quick brown fox jumps"
        host = quote + " " + " ".join(f"filler{i} pad{i}" for i in range(100))
        other = " ".join(f"unrelated{i} noise{i}" for i in range(30))
        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array([quote, host, other], pa.string()),
                }
            )
        )
        ov = shingle_jaccard_pairs(docs, t_num=8, t_den=10, sim="overlap")
        assert ov is not None
        pairs = set(zip(ov["a"].to_pylist(), ov["b"].to_pylist()))
        assert (1, 2) in pairs
        row = ov.to_pandas().set_index(["a", "b"]).loc[(1, 2)]
        assert row["overlap"] == 1.0

        jac = shingle_jaccard_pairs(docs, t_num=8, t_den=10, sim="jaccard")
        jpairs = (
            set(zip(jac["a"].to_pylist(), jac["b"].to_pylist()))
            if jac is not None
            else set()
        )
        assert (1, 2) not in jpairs

    def test_overlap_matches_brute_force(self, ray_session):
        """Random near-dup corpus: the distributed containment join equals
        the all-pairs brute force at the same threshold."""
        import ray.data as rd

        from anansi_ray.functions.dedup import _shingle_hashes

        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(40)]
        texts = []
        for i in range(60):
            m = int(rng.integers(4, 30))
            texts.append(" ".join(rng.choice(vocab, m)))
        # plant containments: doc i+100 is a prefix slice of doc i
        ids = list(range(60))
        planted = []
        for i in range(0, 20, 3):
            words = texts[i].split()
            planted.append(" ".join(words[: max(4, len(words) * 2 // 3)]))
            ids.append(100 + i)
        texts += planted
        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        ).repartition(5)
        out = shingle_jaccard_pairs(docs, t_num=8, t_den=10, sim="overlap")
        got = (
            set(zip(out["a"].to_pylist(), out["b"].to_pylist()))
            if out is not None
            else set()
        )
        sets = {d: set(_shingle_hashes(t, 3)) for d, t in zip(ids, texts)}
        want = set()
        for x in ids:
            for y in ids:
                if x >= y:
                    continue
                inter = len(sets[x] & sets[y])
                mn = min(len(sets[x]), len(sets[y]))
                if mn > 0 and 10 * inter >= 8 * mn:
                    want.add((x, y))
        assert got == want
