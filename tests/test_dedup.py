"""Dedup operator tests: exact, MinHash-LSH (planted near-dups), SimHash,
n-gram Jaccard, connected components."""

import pyarrow as pa
import pytest

from anansi_ray.functions import dedup as D


def _docs_with_planted_dups():
    base = (
        "linked open data crawl frontier spider resource graph triple node "
        "archive media stream fetch cache index shard bucket token host queue "
        "ledger round manifest checkpoint politeness scheduler actor arrow"
    )
    words = base.split()
    rows = []
    # 0/1: near-identical (one word changed)
    rows.append(" ".join(words))
    rows.append(" ".join(words[:-1] + ["zebra"]))
    # 2: exact duplicate of 0
    rows.append(" ".join(words))
    # 3/4: unrelated
    rows.append("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    rows.append("one two three four five six seven eight nine ten eleven")
    # 5: near-dup of 3 (prefix shared)
    rows.append("alpha beta gamma delta epsilon zeta eta theta iota lambda")
    return pa.table({"doc_id": list(range(len(rows))), "text": rows})


@pytest.mark.usefixtures("ray_session")
class TestMinhash:
    def test_planted_pairs_found(self):
        import ray.data as rd

        ds = rd.from_arrow(_docs_with_planted_dups())
        pairs = D.minhash_candidate_pairs(ds, min_jaccard=0.5)
        got = {(a, b) for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist())}
        assert (0, 2) in got  # exact dup: est_jaccard == 1
        assert (0, 1) in got or (1, 2) in got  # near dup
        assert (3, 5) in got
        assert (3, 4) not in got and (0, 4) not in got

    def test_exact_dup_estimate_is_one(self):
        import ray.data as rd

        ds = rd.from_arrow(_docs_with_planted_dups())
        pairs = D.minhash_candidate_pairs(ds, min_jaccard=0.5)
        by_pair = {
            (a, b): j
            for a, b, j in zip(
                pairs["a"].to_pylist(),
                pairs["b"].to_pylist(),
                pairs["est_jaccard"].to_pylist(),
            )
        }
        assert by_pair[(0, 2)] == 1.0

    def test_connected_components(self):
        pairs = pa.table(
            {"a": pa.array([0, 1, 3], pa.int64()), "b": pa.array([1, 2, 5], pa.int64())}
        )
        cc = D.connected_components(pairs, range(6))
        groups = dict(zip(cc["doc_id"].to_pylist(), cc["dup_group"].to_pylist()))
        assert groups[0] == groups[1] == groups[2] == 0
        assert groups[3] == groups[5] == 3
        assert groups[4] == 4


class TestSignatures:
    def test_minhash_jaccard_estimate_tracks_truth(self):
        a = "the quick brown fox jumps over the lazy dog again and again ok"
        b = "the quick brown fox jumps over the lazy cat again and again ok"
        sa, sb = D.minhash_signature(a), D.minhash_signature(b)
        est = (sa == sb).mean()
        true = D.ngram_jaccard(a, b)
        assert abs(est - true) < 0.25
        assert (D.minhash_signature(a) == sa).all()  # deterministic

    def test_simhash_near_for_near_texts(self):
        a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
        ha, hb = D.simhash64(a), D.simhash64(b)
        assert bin(ha ^ hb).count("1") <= 16
        c = "totally different words everywhere nothing shared here at all"
        assert bin(ha ^ D.simhash64(c)).count("1") > 16

    def test_ngram_jaccard_bounds(self):
        assert D.ngram_jaccard("a b c d", "a b c d") == 1.0
        assert D.ngram_jaccard("a b c d", "x y z w") == 0.0
        assert D.ngram_jaccard("", "") == 1.0


@pytest.mark.usefixtures("ray_session")
def test_embedding_lsh_recall_vs_exact():
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = D.embedding_near_dup_pairs(ds, threshold=0.45)
    approx = D.embedding_near_dup_lsh(ds, threshold=0.45, n_tables=8, n_bits=6)
    exact_pairs = set(zip(exact["a"].to_pylist(), exact["b"].to_pylist()))
    approx_pairs = set(zip(approx["a"].to_pylist(), approx["b"].to_pylist()))
    assert approx_pairs <= exact_pairs  # verify step ⇒ no false positives
    if exact_pairs:
        recall = len(approx_pairs & exact_pairs) / len(exact_pairs)
        assert recall >= 0.7, recall


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_idempotent_on_real_table():
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    once = D.exact_dedup(ds).to_pandas().sort_values("text_hash", ignore_index=True)
    # dedup of the dedup output keyed the same way is identity-sized
    assert len(once) == len(once.drop_duplicates("text_hash"))
    assert once["doc_id"].is_unique


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_equals_reference_map_groups_path():
    """The aggregate-based exact_dedup must equal the retired per-group
    map_groups reduction (the round-3 implementation) row for row."""
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    new = D.exact_dedup(ds).to_pandas().sort_values("text_hash", ignore_index=True)

    hashed = ds.map_batches(
        lambda b: D.text_hash_batch(b, "text").select(["text_hash", "doc_id"]),
        batch_format="pyarrow",
    )

    def keep_min(group: pa.Table) -> pa.Table:
        m = pc.min_max(group["doc_id"])["min"]
        return pa.table(
            {"text_hash": group["text_hash"][:1], "doc_id": pa.array([m.as_py()])}
        )

    old = (
        hashed.groupby("text_hash")
        .map_groups(keep_min, batch_format="pyarrow")
        .to_pandas()
        .sort_values("text_hash", ignore_index=True)
    )
    assert new.equals(old)


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_string_ids():
    """exact_dedup must preserve non-numeric id dtypes (lexicographic min)."""
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": ["d9", "d2", "d10", "x1"],
            "text": ["same", "same", "same", "other"],
        }
    )
    out = D.exact_dedup(rd.from_arrow(t)).to_pandas()
    kept = dict(zip(out["text_hash"], out["doc_id"]))
    assert sorted(kept.values()) == ["d10", "x1"]  # 'd10' < 'd2' < 'd9'


@pytest.mark.usefixtures("ray_session")
class TestDistributedCC:
    def test_matches_driver_union_find_planted(self):
        import ray.data as rd

        pairs = pa.table(
            {"a": pa.array([0, 1, 3], pa.int64()), "b": pa.array([1, 2, 5], pa.int64())}
        )
        ids = rd.from_arrow(pa.table({"doc_id": pa.array(range(6), pa.int64())}))
        got = D.connected_components_distributed(pairs, ids)
        exp = D.connected_components(pairs, range(6))
        assert got.to_pylist() == exp.to_pylist()

    def test_matches_driver_union_find_chain(self):
        # a chain forces multiple propagation iterations (each iteration
        # costs two shuffles, so keep n moderate for suite time)
        import ray.data as rd

        n = 12
        pairs = pa.table(
            {
                "a": pa.array(list(range(n - 1)), pa.int64()),
                "b": pa.array(list(range(1, n)), pa.int64()),
            }
        )
        ids = rd.from_arrow(pa.table({"doc_id": pa.array(range(n + 5), pa.int64())}))
        got = D.connected_components_distributed(pairs, ids)
        exp = D.connected_components(pairs, range(n + 5))
        assert got.to_pylist() == exp.to_pylist()

    def test_matches_on_real_minhash_pairs(self):
        # end-to-end over the testdata documents table: the distributed
        # min-label propagation must equal the driver union-find exactly
        import ray.data as rd

        sf = "/root/testdata/sf0.001"
        ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        pairs = D.minhash_candidate_pairs(ds, min_jaccard=0.5)
        ids_ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
        got = D.connected_components_distributed(pairs, ids_ds)
        import pyarrow.parquet as pq

        all_ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_pylist()
        exp = D.connected_components(pairs, all_ids)
        assert got.to_pylist() == exp.to_pylist()


class TestCCLabelsResume:
    def test_kill_and_resume_equal(self, ray_session, tmp_path):
        """A long min-label chain (path graph) killed mid-propagation and
        resumed from the committed superstep checkpoint produces exactly
        the uninterrupted components (labels only ever decrease, so the
        restored trajectory is exact)."""
        import numpy as np
        import ray.data as rd

        from anansi_ray.functions.dedup import (
            _collect_sorted,
            connected_components_labels,
        )

        n = 40  # a 40-node path needs many supersteps to converge
        pairs = pa.table(
            {
                "a": pa.array(np.arange(n - 1, dtype=np.int64), pa.int64()),
                "b": pa.array(np.arange(1, n, dtype=np.int64), pa.int64()),
            }
        )
        ids = rd.from_arrow(
            pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
        )
        want = _collect_sorted(
            connected_components_labels(pairs, ids), ["doc_id"]
        )
        assert set(want["dup_group"].to_pylist()) == {0}  # one component

        ck = str(tmp_path / "cc_ck")
        killed = connected_components_labels(
            pairs, ids, checkpoint_dir=ck, stop_after=2
        )
        assert killed is None

        got = _collect_sorted(
            connected_components_labels(
                pairs, ids, checkpoint_dir=ck, resume=True
            ),
            ["doc_id"],
        )
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
        assert got["dup_group"].to_pylist() == want["dup_group"].to_pylist()
