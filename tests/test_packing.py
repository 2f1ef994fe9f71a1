"""Sequence packing (functions/packing.py): next-fit semantics + bucket
determinism across block layouts."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anansi_ray.functions.packing import pack_bucket_ids, pack_sequences


class TestNextFit:
    def test_fills_then_opens_next(self):
        seq, off = pack_bucket_ids(
            np.arange(4), np.array([200, 200, 200, 100]), budget=512
        )
        # 200+200 fits, +200 would exceed -> new seq; 200+100 fits
        assert seq.tolist() == [0, 0, 1, 1]
        assert off.tolist() == [0, 200, 0, 200]

    def test_oversized_doc_gets_own_sequence(self):
        seq, off = pack_bucket_ids(
            np.arange(3), np.array([100, 900, 100]), budget=512
        )
        assert seq.tolist() == [0, 1, 2]
        assert off.tolist() == [0, 0, 0]

    def test_exact_fit_boundary(self):
        seq, _ = pack_bucket_ids(np.arange(2), np.array([512, 1]), budget=512)
        assert seq.tolist() == [0, 1]


@pytest.mark.usefixtures("ray_session")
def test_distributed_layout_independent():
    rng = np.random.default_rng(5)
    n = 400
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(
                [" ".join(["w"] * int(k)) for k in rng.integers(1, 600, n)],
                pa.string(),
            ),
        }
    )
    results = []
    for slices in (1, 5):
        step = (n + slices - 1) // slices
        ds = rd.from_arrow([tbl.slice(i, step) for i in range(0, n, step)])
        out = pack_sequences(ds)
        rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
        results.append(
            [
                (r["doc_id"], r["bucket"], r["seq_idx"], r["offset"], r["n_tokens"])
                for r in rows
            ]
        )
    assert results[0] == results[1]
    # every offset+doc fits its budget except single-doc oversize sequences
    by_seq: dict = {}
    for r in sorted(results[0]):
        by_seq.setdefault((r[1], r[2]), []).append(r)
    from anansi_ray.functions.packing import PACK_BUDGET

    for (bucket, seq), docs in by_seq.items():
        last = max(docs, key=lambda r: r[3])
        if len(docs) == 1 and last[4] > PACK_BUDGET:
            assert last[3] == 0, (bucket, seq)  # oversize doc packs alone at 0
            continue
        assert last[3] + last[4] <= PACK_BUDGET, (bucket, seq, last)
