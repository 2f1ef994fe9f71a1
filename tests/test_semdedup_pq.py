"""SemDeDup (functions/semdedup.py) and PQ ANN (functions/pq.py): the
distributed paths must land on their single-threaded twins exactly,
whatever the block layout — the determinism contracts (rounded
centroids, shape-independent distance reductions, rounded cosines/ADC,
id tiebreaks) are what make the full value oracles possible."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anansi_ray.functions.pq import PQ_TOPK, knn_pq_distributed, knn_pq_local
from anansi_ray.functions.semdedup import (
    semantic_dedup_distributed,
    semantic_dedup_local,
    semdedup_cluster_kernel,
)


def _synth(n=200, dim=16, seed=3, dup_every=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(4, dim)) * 5
    X = centers[rng.integers(0, 4, n)] + rng.normal(size=(n, dim))
    if dup_every:
        # plant exact duplicates so the dedup has real work
        X[dup_every::dup_every] = X[: len(X[dup_every::dup_every])]
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in X], pa.list_(pa.float32())
            ),
        }
    )


def _sorted_pd(tbl):
    return (
        tbl.to_pandas()
        .sort_values(list(tbl.column_names), ignore_index=True)
    )


@pytest.mark.usefixtures("ray_session")
class TestSemanticDedup:
    def test_distributed_matches_local_across_block_layouts(self):
        t = _synth(n=240, dup_every=7)
        exp = _sorted_pd(semantic_dedup_local(t))
        for nblocks in (1, 3, 8):
            ds = rd.from_arrow(t).repartition(nblocks)
            got = _sorted_pd(
                pa.Table.from_pandas(
                    semantic_dedup_distributed(ds).to_pandas(),
                    preserve_index=False,
                )
            )
            assert got.equals(exp), f"mismatch at nblocks={nblocks}"

    def test_planted_duplicates_collapse(self):
        t = _synth(n=120, dup_every=5)
        out = semantic_dedup_local(t)
        keep = out["keep"].to_numpy(zero_copy_only=False)
        rep = out["rep_id"].to_numpy(zero_copy_only=False)
        ids = out["vec_id"].to_numpy(zero_copy_only=False)
        # planted exact dups must NOT all be kept, and every dropped row's
        # representative must itself be kept
        assert (keep == 0).sum() > 0
        kept_ids = set(ids[keep == 1])
        assert set(rep[keep == 0]) <= kept_ids
        # a representative is the minimum id of its group
        for r, i in zip(rep, ids):
            assert r <= i

    def test_kernel_transitive_chain(self):
        # a -> b -> c chained near-dups: one component, min id kept
        base = np.zeros((3, 4))
        base[0] = [1.0, 0.0, 0.0, 0.0]
        base[1] = [0.995, 0.0999, 0.0, 0.0]  # ~cos 0.995 with a
        base[2] = [0.98, 0.198, 0.0, 0.0]    # near b, farther from a
        ids = np.array([10, 20, 30], np.int64)
        rep, keep = semdedup_cluster_kernel(ids, base, tau=0.99)
        assert list(rep) == [10, 10, 10]
        assert list(keep) == [1, 0, 0]

    def test_kernel_no_edges(self):
        X = np.eye(3)
        ids = np.array([1, 2, 3], np.int64)
        rep, keep = semdedup_cluster_kernel(ids, X, tau=0.5)
        assert list(rep) == [1, 2, 3]
        assert list(keep) == [1, 1, 1]


@pytest.mark.usefixtures("ray_session")
class TestKnnPQ:
    def test_distributed_matches_local_across_block_layouts(self):
        t = _synth(n=300, dim=16, seed=11)
        exp = knn_pq_local(t).to_pandas()
        for nblocks in (1, 4, 9):
            ds = rd.from_arrow(t).repartition(nblocks)
            got = knn_pq_distributed(ds).to_pandas()
            assert got.reset_index(drop=True).equals(
                exp.reset_index(drop=True)
            ), f"mismatch at nblocks={nblocks}"

    def test_shape_and_self_exclusion(self):
        t = _synth(n=100, dim=16, seed=5)
        out = knn_pq_local(t).to_pandas()
        for qid, grp in out.groupby("query_id"):
            assert list(grp["rank"]) == list(range(1, PQ_TOPK + 1))
            assert qid not in set(grp["vec_id"])
            d = grp["adc"].to_numpy()
            assert (np.diff(d) >= 0).all()

    def test_exact_duplicate_is_rank_one(self):
        # vector 99 is an exact copy of query vector 0: it shares the
        # query's codes, so its ADC distance is the minimum any code cell
        # can reach (the query's own quantization error — ADC is
        # asymmetric, so it is NOT zero) and it must rank first
        t = _synth(n=100, dim=16, seed=7)
        X = np.stack([np.asarray(e, np.float64) for e in t["embedding"].to_pylist()])
        X[99] = X[0]
        t2 = pa.table(
            {
                "vec_id": t["vec_id"],
                "embedding": pa.array(
                    [row.astype(np.float32) for row in X], pa.list_(pa.float32())
                ),
            }
        )
        out = knn_pq_local(t2).to_pandas()
        q0 = out[out["query_id"] == 0]
        first = q0[q0["rank"] == 1]
        assert first["vec_id"].iloc[0] == 99
        assert first["adc"].iloc[0] == q0["adc"].min()

    def test_fewer_rows_than_codewords(self):
        t = _synth(n=7, dim=16, seed=9)
        exp = knn_pq_local(t).to_pandas()
        got = knn_pq_distributed(rd.from_arrow(t).repartition(3)).to_pandas()
        assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))
        # 5 queries x 6 candidates (self excluded)
        assert len(exp) == 5 * 6


@pytest.mark.usefixtures("ray_session")
class TestKnnIVFPQ:
    def test_distributed_matches_local_across_block_layouts(self):
        from anansi_ray.functions.pq import knn_ivfpq_distributed, knn_ivfpq_local

        t = _synth(n=300, dim=16, seed=13)
        exp = knn_ivfpq_local(t).to_pandas()
        for nblocks in (1, 4, 9):
            ds = rd.from_arrow(t).repartition(nblocks)
            got = knn_ivfpq_distributed(ds).to_pandas()
            assert got.reset_index(drop=True).equals(
                exp.reset_index(drop=True)
            ), f"mismatch at nblocks={nblocks}"

    def test_probed_subset_of_pq_candidates(self):
        # IVFPQ scans only nprobe cells: every neighbour it returns must be
        # ranked by the same ADC geometry, monotone within a query, and
        # self-excluded — and with nprobe == n_cells it would equal plain
        # PQ, so with fewer probes the candidate pool can only shrink
        from anansi_ray.functions.pq import IVF_NPROBE, knn_ivfpq_local

        t = _synth(n=200, dim=16, seed=17)
        out = knn_ivfpq_local(t).to_pandas()
        assert len(out) > 0
        for qid, grp in out.groupby("query_id"):
            assert list(grp["rank"]) == list(range(1, len(grp) + 1))
            assert qid not in set(grp["vec_id"])
            d = grp["adc"].to_numpy()
            assert (np.diff(d) >= 0).all()

    def test_probe_plan_prunes_cells(self):
        # the search must only touch IVF_NPROBE cells per query
        from anansi_ray.functions.clustering import _assign
        from anansi_ray.functions.pq import (
            IVF_NPROBE,
            _coarse_fit_local,
            knn_ivfpq_local,
        )

        t = _synth(n=250, dim=16, seed=19)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        X = np.stack([np.asarray(e, np.float64) for e in t["embedding"].to_pylist()])
        Co = _coarse_fit_local(ids, X)
        cells = _assign(X, Co)
        out = knn_ivfpq_local(t).to_pandas()
        cell_of = dict(zip(ids.tolist(), cells.tolist()))
        for qid, grp in out.groupby("query_id"):
            touched = {cell_of[v] for v in grp["vec_id"]}
            assert len(touched) <= IVF_NPROBE

    def test_fewer_rows_than_cells(self):
        from anansi_ray.functions.pq import knn_ivfpq_distributed, knn_ivfpq_local

        t = _synth(n=5, dim=16, seed=21)
        exp = knn_ivfpq_local(t).to_pandas()
        got = knn_ivfpq_distributed(rd.from_arrow(t).repartition(2)).to_pandas()
        assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))

    def test_empty_input(self):
        from anansi_ray.functions.pq import knn_ivfpq_local

        t = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
        out = knn_ivfpq_local(t)
        assert out.num_rows == 0
        assert out.column_names == ["query_id", "rank", "vec_id", "adc"]
