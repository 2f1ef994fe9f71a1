"""S7 — remote-scheme sink exercised structurally: the same write paths
that would target ``s3://`` are driven through ``file://`` (pyarrow.fs
dispatch) and Ray's ``local://`` scheme, validating the scheme→backend
dispatch (≙ cache.c:209-229; S3 vtable s3.c:160-359) without a network."""

import pyarrow as pa
import pytest

from anansi_ray.sources import storage


class TestStorageUri:
    def test_file_uri_roundtrip(self, tmp_path):
        tbl = pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})
        dest = storage.write_table(tbl, f"file://{tmp_path}/sub/dir/t")
        assert dest.endswith(".parquet")
        back = storage.read_table(f"file://{tmp_path}/sub/dir/t")
        assert back.equals(tbl)

    def test_plain_path_still_works(self, tmp_path):
        tbl = pa.table({"k": [1]})
        storage.write_table(tbl, str(tmp_path / "x"))
        assert storage.read_table(str(tmp_path / "x")).equals(tbl)

    def test_resolve_uri_scheme_dispatch(self):
        filesystem, p = storage.resolve_uri("file:///tmp/x")
        assert filesystem is not None and p == "/tmp/x"
        filesystem, p = storage.resolve_uri("/tmp/x")
        assert filesystem is None


@pytest.mark.usefixtures("ray_session")
def test_ray_sink_through_uri_scheme(tmp_path):
    """One round's documents written through a scheme'd URI by the SAME
    Dataset.write_parquet sink the crawl pipeline uses — pointing it at
    s3:// is a config change, not a code change."""
    import ray.data as rd

    from anansi_ray import fixtures
    from anansi_ray.model import CrawlConfig
    from anansi_ray.pipelines.crawl import CrawlPipeline

    tiny = fixtures.generate("tiny", seed=42)
    pipe = CrawlPipeline(tiny, CrawlConfig())
    pipe.run_round()
    docs = pipe.results()["documents"]
    assert docs is not None and docs.num_rows > 0

    uri = f"local://{tmp_path}/docs_round0"
    rd.from_arrow(docs).write_parquet(uri)
    back = rd.read_parquet(uri).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == sorted(docs["doc_id"].to_pylist())


@pytest.mark.skipif(not storage.HAVE_LANCE, reason="pylance not installed")
class TestLanceBackend:
    """Runs only where pylance exists: proves the format flip is real the
    moment the dependency appears (parquet path identical either way)."""

    def test_lance_roundtrip(self, tmp_path):
        tbl = pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})
        dest = storage.write_table(tbl, f"{tmp_path}/t", fmt="lance")
        assert dest.endswith(".lance")
        back = storage.read_table(f"{tmp_path}/t")
        assert back.equals(tbl)

    def test_default_format_is_lance(self):
        assert storage.DEFAULT_FORMAT == "lance"
