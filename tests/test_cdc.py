"""Content-defined chunking (functions/cdc.py): boundary determinism
(shift-invariance is the whole point of CDC), reassembly, layout
invariance of the distributed stats, and the dedup invariants."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anansi_ray.functions.cdc import (
    cdc_boundaries,
    cdc_dedup_distributed,
    cdc_dedup_local,
    chunk_payload,
)


def _payloads(n=60, seed=9):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    out = []
    for i in range(n):
        a = int(rng.integers(0, 2048))
        b = int(rng.integers(a + 256, 4096))
        # shared middle slice + unique head → sub-object duplication
        out.append(bytes([i % 256]) * int(rng.integers(1, 40)) + base[a:b])
    return pa.table({"payload": pa.array(out, pa.binary())})


class TestCDCKernel:
    def test_chunks_reassemble(self):
        rng = np.random.default_rng(1)
        for n in (0, 1, 15, 16, 17, 300, 5000):
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            assert b"".join(chunk_payload(data)) == data

    def test_content_defined_shift_invariance(self):
        # the SAME content at a different offset produces the same
        # interior chunks (boundaries depend only on local bytes)
        rng = np.random.default_rng(2)
        core = rng.integers(0, 256, 2000, dtype=np.uint8).tobytes()
        a = chunk_payload(b"XYZ" + core)
        b = chunk_payload(b"0123456789ABCDEFGHIJ" + core)
        # drop the first two chunks of each (prefix-affected), compare tails
        assert a[2:] == b[2:] or a[3:] == b[3:]

    def test_boundaries_sorted_and_end_included(self):
        data = bytes(range(256)) * 8
        cuts = cdc_boundaries(data)
        assert (np.diff(cuts) > 0).all()
        assert cuts[-1] == len(data) - 1


@pytest.mark.usefixtures("ray_session")
class TestCDCDedup:
    def test_distributed_matches_local_across_layouts(self):
        t = _payloads()
        exp = cdc_dedup_local(t).to_pandas()
        for nb in (1, 4, 9):
            got = cdc_dedup_distributed(
                rd.from_arrow(t).repartition(nb)
            ).to_pandas()
            assert got.equals(exp), f"mismatch at nblocks={nb}"

    def test_dedup_invariants(self):
        out = cdc_dedup_local(_payloads()).to_pandas().iloc[0]
        assert out["bytes_unique"] <= out["bytes_total"]
        assert out["n_unique"] <= out["n_chunks"]
        # the planted shared slices must actually dedup
        assert out["dedup_ratio"] < 0.9

    def test_duplicate_payloads_fully_collapse(self):
        blob = bytes(np.random.default_rng(3).integers(0, 256, 3000, dtype=np.uint8))
        t = pa.table({"payload": pa.array([blob] * 5, pa.binary())})
        out = cdc_dedup_local(t).to_pandas().iloc[0]
        assert out["bytes_total"] == 5 * out["bytes_unique"]

    def test_empty(self):
        t = pa.table({"payload": pa.array([], pa.binary())})
        out = cdc_dedup_local(t).to_pandas().iloc[0]
        assert out["n_chunks"] == 0 and out["dedup_ratio"] == 0.0
        got = cdc_dedup_distributed(rd.from_arrow(t)).to_pandas().iloc[0]
        assert got["n_chunks"] == 0


class TestCDCProperties:
    def test_reassembly_hypothesis(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.binary(min_size=0, max_size=2000))
        def prop(data):
            chunks = chunk_payload(data)
            assert b"".join(chunks) == data
            assert all(len(c) > 0 for c in chunks)

        prop()

    def test_boundary_locality_hypothesis(self):
        # boundaries strictly inside a shared suffix are identical
        # regardless of what came >= W bytes earlier (content-defined)
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from anansi_ray.functions.cdc import CDC_W, cdc_boundaries

        @settings(max_examples=100, deadline=None)
        @given(
            st.binary(min_size=1, max_size=50),
            st.binary(min_size=1, max_size=50),
            st.binary(min_size=100, max_size=800),
        )
        def prop(pre_a, pre_b, core):
            a = set(int(x) - len(pre_a) for x in cdc_boundaries(pre_a + core))
            b = set(int(x) - len(pre_b) for x in cdc_boundaries(pre_b + core))
            # compare only interior cuts fully determined by core bytes
            interior = range(CDC_W, len(core) - 1)
            assert {x for x in a if x in interior} == {
                x for x in b if x in interior
            }

        prop()
