"""Driver-local Dataset construction helpers (anansi_ray/arrowds.py).

``drop_empty_blocks`` exists because Ray's sort-based
``groupby().map_groups`` emits zero-row blocks with an EMPTY schema for
keyless range partitions, and ``map_batches`` UDFs are never invoked on
empty blocks — so the only place to repair them is driver-side block
metadata.  These tests pin that contract.
"""

import pyarrow as pa
import pytest
import ray
import ray.data as rd

from anansi_ray.arrowds import drop_empty_blocks, from_arrow_local


@pytest.mark.usefixtures("ray_session")
class TestDropEmptyBlocks:
    def _with_empties(self):
        # 4 range partitions over 2 keys -> >=1 zero-row empty-schema block
        return (
            rd.from_arrow(pa.table({"k": [1, 2], "v": [10, 20]}))
            .repartition(4)
            .groupby("k")
            .map_groups(lambda g: g, batch_format="pyarrow")
            .materialize()
        )

    def test_strips_empty_blocks_keeps_rows(self):
        ds = self._with_empties()
        assert ds.num_blocks() > 1  # empties present before
        out = drop_empty_blocks(ds)
        assert out.count() == 2
        assert all(
            md.num_rows > 0
            for b in out.iter_internal_ref_bundles()
            for _, md in b.blocks
        )
        got = sorted(out.take_all(), key=lambda r: r["k"])
        assert got == [{"k": 1, "v": 10}, {"k": 2, "v": 20}]

    def test_schema_survives(self):
        out = drop_empty_blocks(self._with_empties())
        sch = out.schema().base_schema
        assert sch.names == ["k", "v"]

    def test_union_after_strip_is_clean(self):
        out = drop_empty_blocks(self._with_empties())
        extra = rd.from_arrow(pa.table({"k": [9], "v": [90]}))
        u = out.union(extra).materialize()
        assert u.count() == 3

    def test_no_empties_is_identity(self):
        ds = rd.from_arrow(pa.table({"k": [1], "v": [2]})).materialize()
        assert drop_empty_blocks(ds) is ds

    def test_all_empty_returns_zero_rows(self):
        ds = (
            rd.from_arrow(pa.table({"k": [1], "v": [2]}))
            .map_batches(lambda b: b.slice(0, 0), batch_format="pyarrow")
            .materialize()
        )
        out = drop_empty_blocks(ds)
        assert out.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_from_arrow_local_roundtrip():
    t = pa.table({"a": [1, 2, 3]})
    ds = from_arrow_local([t.slice(0, 2), t.slice(2)])
    assert ds.count() == 3
    assert [r["a"] for r in ds.take_all()] == [1, 2, 3]
