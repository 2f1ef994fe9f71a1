"""Driver-contract smoke: entry() / queries() / oracle_sql() shape checks
exactly as the driver consumes them (Ray initialised externally)."""

import os
import sys

import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.usefixtures("ray_session")
class TestEntryContract:
    def test_entry_returns_documents(self):
        import __ray_entry__ as m

        out = m.entry()
        assert isinstance(out, pa.Table)
        assert out.num_rows > 0
        assert set(out.column_names) == {"doc_id", "spans"}
        spans = out["spans"][0].as_py()
        assert spans and {"kind", "text", "media_ref", "offset"} <= set(spans[0])

    def test_every_oracle_key_has_query(self):
        import __ray_entry__ as m

        qs = m.queries()
        sqls = m.oracle_sql()
        assert set(sqls) <= set(qs)
        assert len(qs) >= 20
        assert len(sqls) >= 13
        for name, fn in qs.items():
            assert callable(fn), name

    def test_sample_query_runs_on_sf0001(self):
        import __ray_entry__ as m

        out = m.queries()["token_count"]("/root/testdata/sf0.001")
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        assert len(df) == 500


def test_bench_queries_cover_registry():
    """bench.py times every queries() entry — keep the two lists in sync so
    a new operator can't silently skip the per-round BENCH artifact."""
    import bench
    from anansi_ray.pipelines.queries import QUERIES

    assert set(bench.BENCH_QUERIES) == set(QUERIES)
