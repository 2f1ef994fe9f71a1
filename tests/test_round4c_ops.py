"""Round-4 third-batch operator semantics: window-frame moving aggregate,
sliding-window distinct users, k-hop BFS reachability, bigram-LM corpus
scoring, exact two-pass heavy hitters — each pinned against an independent
pandas/set twin on sf0.001.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from anansi_ray.pipelines.queries import (
    q_bigram_lm_score,
    q_events_moving_avg,
    q_heavy_hitter_words,
    q_incremental_near_dup,
    q_link_khop,
    q_shingle_jaccard_join,
    q_sliding_distinct_users,
    q_weighted_sample,
)

SF0001 = "/root/testdata/sf0.001"


def _pdf(name, columns=None):
    return pq.read_table(f"{SF0001}/{name}.parquet", columns=columns).to_pandas()


class TestEventsMovingAvg:
    def test_vs_pandas_rolling(self):
        got = q_events_moving_avg(SF0001).to_pandas()
        ev = _pdf("events", ["event_id", "ts", "user_id", "value"])
        ev["v"] = (ev["value"] * 10000).round().astype("int64")
        ev["ts_us"] = ev["ts"].astype("int64")
        ev = ev.sort_values(["user_id", "ts_us", "event_id"])
        g = ev.groupby("user_id")["v"]
        ev["w_sum"] = g.rolling(3, min_periods=1).sum().reset_index(0, drop=True)
        ev["w_n"] = g.rolling(3, min_periods=1).count().reset_index(0, drop=True)
        want = (
            ev[["event_id", "w_sum", "w_n"]]
            .astype("int64")
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    def test_frame_never_crosses_user(self):
        # one user per event at most 3 rows summed: w_n <= 3 everywhere,
        # and the first event of each user has w_n == 1
        got = q_events_moving_avg(SF0001).to_pandas()
        assert got["w_n"].between(1, 3).all()
        ev = _pdf("events", ["event_id", "ts", "user_id"])
        ev["ts_us"] = ev["ts"].astype("int64")
        firsts = (
            ev.sort_values(["ts_us", "event_id"]).groupby("user_id")["event_id"].first()
        )
        m = got.set_index("event_id")["w_n"]
        assert (m.loc[firsts.to_numpy()] == 1).all()


class TestSlidingDistinctUsers:
    def test_vs_set_twin(self):
        got = q_sliding_distinct_users(SF0001).to_pandas()
        ev = _pdf("events", ["ts", "user_id"])
        h = ev["ts"].astype("int64") // 3_600_000_000
        pairs = set(zip(h, ev["user_id"]))
        win = {}
        for hh, u in pairs:
            for w in (hh, hh - 1, hh - 2):
                win.setdefault(w, set()).add(u)
        want = (
            pd.DataFrame(
                {
                    "window_us": [w * 3_600_000_000 for w in win],
                    "n_users": [len(s) for s in win.values()],
                }
            )
            .astype("int64")
            .sort_values("window_us")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    def test_distinct_not_sum_of_hourlies(self):
        # a user active in 2 adjacent hours must count ONCE in the window
        # covering both — guard against the per-hour-sum shortcut
        got = q_sliding_distinct_users(SF0001).to_pandas()
        ev = _pdf("events", ["ts", "user_id"])
        h = ev["ts"].astype("int64") // 3_600_000_000
        hourly = pd.DataFrame({"h": h, "u": ev["user_id"]}).drop_duplicates()
        per_hour = hourly.groupby("h").size()
        # find a window where the naive sum exceeds the distinct count
        naive = {
            w: int(sum(per_hour.get(w + i, 0) for i in range(3)))
            for w in got["window_us"] // 3_600_000_000
        }
        m = got.set_index(got["window_us"] // 3_600_000_000)["n_users"]
        assert all(m.loc[w] <= naive[w] for w in naive)
        assert any(m.loc[w] < naive[w] for w in naive)


class TestLinkKhop:
    def test_vs_bfs_twin(self):
        got = q_link_khop(SF0001).to_pandas()
        docs = _pdf("documents", ["doc_id"])["doc_id"].to_numpy()
        nd = len(docs)
        adj = {int(i): [int((2 * i + 1) % nd), int((3 * i + 7) % nd)] for i in docs}
        rows = []
        for r in docs[docs % 53 == 0]:
            seen = {int(r)}
            frontier = {int(r)}
            for _ in range(3):
                nxt = {d for n in frontier for d in adj[n]} - seen
                seen |= nxt
                frontier = nxt
            rows.append((int(r), len(seen)))
        want = (
            pd.DataFrame(rows, columns=["root", "n_reach"])
            .astype("int64")
            .sort_values("root")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


class TestBigramLmScore:
    def test_vs_counter_twin(self):
        from collections import Counter

        got = q_bigram_lm_score(SF0001).to_pandas()
        docs = _pdf("documents", ["doc_id", "text"])
        corpus = Counter()
        per_doc = {}
        for _, row in docs.iterrows():
            ws = row["text"].split(" ")
            bgs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
            per_doc[row["doc_id"]] = bgs
            corpus.update(bgs)
        rows = [
            (d, sum(corpus[b] for b in bgs)) for d, bgs in per_doc.items() if bgs
        ]
        want = (
            pd.DataFrame(rows, columns=["doc_id", "lm_hits"])
            .astype("int64")
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


class TestHeavyHitterWords:
    def test_vs_counter_twin(self):
        from collections import Counter

        got = q_heavy_hitter_words(SF0001).to_pandas()
        docs = _pdf("documents", ["text"])
        c = Counter()
        for t in docs["text"]:
            c.update(t.split(" "))
        n = sum(c.values())
        want = (
            pd.DataFrame(
                [(w, k) for w, k in c.items() if k * 1000 > n],
                columns=["word", "cnt"],
            )
            .sort_values("word")
            .reset_index(drop=True)
        )
        want["cnt"] = want["cnt"].astype("int64")
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    def test_candidate_superset_guarantee(self):
        # pigeonhole: every global heavy hitter must appear as a pass-1
        # local candidate — the exactness hinges on this
        from collections import Counter

        from anansi_ray.functions.text import word_hh_partial

        rng = np.random.default_rng(7)
        texts = [
            " ".join(rng.choice(["a", "b", "c", "d", "hot"], size=50, p=[0.2, 0.2, 0.2, 0.2, 0.2]))
            for _ in range(40)
        ]
        c = Counter(w for t in texts for w in t.split(" "))
        n = sum(c.values())
        hh = {w for w, k in c.items() if k * 1000 > n}
        cands = set()
        for i in range(0, 40, 7):  # uneven batch split
            b = pa.table({"text": pa.array(texts[i : i + 7], pa.string())})
            p = word_hh_partial(b, phi_inv=1000).to_pandas()
            cands |= set(p.loc[p["kind"] == "c", "word"])
        assert hh <= cands


class TestShingleJaccardJoin:
    def test_vs_brute_force(self):
        got = q_shingle_jaccard_join(SF0001).to_pandas()
        docs = _pdf("documents", ["doc_id", "text"])
        import re

        sets = {}
        for _, row in docs.iterrows():
            ws = re.findall(r"\w+", row["text"].lower())
            sh = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
            if sh:
                sets[int(row["doc_id"])] = sh
        ids = sorted(sets)
        rows = []
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if 10 * inter >= 6 * union:
                    rows.append((a, b, round(inter / union, 6)))
        want = (
            pd.DataFrame(rows, columns=["a", "b", "jaccard"])
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        got = got.sort_values(["a", "b"]).reset_index(drop=True)
        # completeness AND exactness: the prefix filter must not lose pairs
        pd.testing.assert_frame_equal(
            got.astype({"a": "int64", "b": "int64"}), want.astype({"a": "int64", "b": "int64"})
        )


class TestWeightedSample:
    def test_vs_direct_twin(self):
        import hashlib

        got = q_weighted_sample(SF0001).to_pandas()
        docs = _pdf("documents", ["doc_id", "n_chars"])
        rank = [
            int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) / w
            for i, w in zip(docs["doc_id"], docs["n_chars"])
        ]
        docs = docs.assign(rank=rank).nsmallest(100, "rank")
        want = (
            docs[["doc_id"]].sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    def test_weight_bias(self):
        # heavier docs must be over-represented vs a uniform draw
        got = q_weighted_sample(SF0001).to_pandas()
        docs = _pdf("documents", ["doc_id", "n_chars"])
        mean_sel = docs.set_index("doc_id").loc[got["doc_id"], "n_chars"].mean()
        assert mean_sel > docs["n_chars"].mean()


class TestIncrementalNearDup:
    def test_vs_brute_force_cross_only(self):
        import re

        from anansi_ray.pipelines.queries import q_incremental_near_dup

        got = q_incremental_near_dup(SF0001).to_pandas()
        docs = _pdf("documents", ["doc_id", "text"])
        sets = {}
        for _, row in docs.iterrows():
            ws = re.findall(r"\w+", row["text"].lower())
            sh = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
            if sh:
                sets[int(row["doc_id"])] = sh
        ids = sorted(sets)
        agg = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if (a % 10 == 0) == (b % 10 == 0):
                    continue
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if 10 * inter >= 6 * union:
                    new_id = a if a % 10 == 0 else b
                    j = round(inter / union, 6)
                    n, bj = agg.get(new_id, (0, 0.0))
                    agg[new_id] = (n + 1, max(bj, j))
        want = (
            pd.DataFrame(
                [(d, n, bj) for d, (n, bj) in agg.items()],
                columns=["doc_id", "n_matches", "best_jaccard"],
            )
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = want.astype({"doc_id": "int64", "n_matches": "int64"})
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    def test_no_corpus_corpus_candidates(self):
        # the incremental shape must never enumerate a corpus x corpus pair
        got = q_incremental_near_dup(SF0001).to_pandas()
        assert (got["doc_id"] % 10 == 0).all()
