"""ANN operators: brute-force top-k vs the IVF index — full probe must be
EXACT, pruned probes must trade recall for scan volume predictably."""

import pyarrow.parquet as pq
import pytest
import ray.data as rd

from anansi_ray.functions import similarity as S

SF = "/root/testdata/sf0.001"
QUERIES = list(range(8))
K = 10


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    return rd.read_parquet(f"{SF}/embeddings.parquet")


@pytest.mark.usefixtures("ray_session")
class TestIvf:
    def test_full_probe_equals_brute(self, emb_ds):
        brute = S.knn_brute(emb_ds, QUERIES, k=K)
        idx = S.IvfIndex(n_cells=8, n_iter=5, seed=42).build(emb_ds)
        full = idx.search(QUERIES, k=K, n_probe=8)
        assert full.to_pylist() == brute.to_pylist()

    def test_pruned_probe_recall(self, emb_ds):
        brute = S.knn_brute(emb_ds, QUERIES, k=K)
        idx = S.IvfIndex(n_cells=8, n_iter=5, seed=42).build(emb_ds)
        pruned = idx.search(QUERIES, k=K, n_probe=3)

        def sets(tbl):
            out = {}
            for r in tbl.to_pylist():
                out.setdefault(r["query_id"], set()).add(r["vec_id"])
            return out

        b, p = sets(brute), sets(pruned)
        recalls = [len(b[q] & p.get(q, set())) / len(b[q]) for q in b]
        mean_recall = sum(recalls) / len(recalls)
        # 3 of 8 cells scanned: recall must beat the random-subset floor by
        # a wide margin (the nearest cells hold the nearest vectors)
        assert mean_recall >= 0.6, recalls

    def test_pruning_actually_prunes(self, emb_ds):
        idx = S.IvfIndex(n_cells=8, n_iter=5, seed=42).build(emb_ds)
        pruned = idx.search(QUERIES, k=K, n_probe=1)
        full = idx.search(QUERIES, k=K, n_probe=8)
        # a 1-cell probe cannot return the identical result set on this
        # data (queries' neighbors span multiple cells)
        assert pruned.to_pylist() != full.to_pylist()
