"""Interleaved-span operators: flatten, stats, end-to-end doc pipeline."""

import pyarrow as pa
import pytest

from anansi_ray.functions.spans import flatten_spans_batch, span_stats_batch
from anansi_ray.model import SPAN_TYPE


def _doc_table():
    spans = [
        [
            {"kind": "text", "text": "hello world", "media_ref": "", "offset": 0},
            {"kind": "image", "text": "", "media_ref": "media://h/m1", "offset": 12},
            {"kind": "text", "text": "more text", "media_ref": "", "offset": 20},
            {"kind": "link", "text": "", "media_ref": "", "offset": 30},
        ],
        [
            {"kind": "audio", "text": "", "media_ref": "media://h/a9", "offset": 0},
        ],
        [],
    ]
    return pa.table(
        {
            "doc_id": ["d0", "d1", "d2"],
            "spans": pa.array(spans, pa.list_(SPAN_TYPE)),
        }
    )


class TestFlatten:
    def test_text_concatenated_in_order(self):
        out = flatten_spans_batch(_doc_table())
        assert out["text"].to_pylist() == ["hello world more text", "", ""]
        assert out["media_refs"].to_pylist() == [["media://h/m1"], ["media://h/a9"], []]
        assert out["n_spans"].to_pylist() == [4, 1, 0]
        assert out["n_text_spans"].to_pylist() == [2, 0, 0]
        assert out["n_media_spans"].to_pylist() == [1, 1, 0]

    def test_stats(self):
        out = span_stats_batch(_doc_table())
        assert out["n_text"].to_pylist() == [2, 0, 0]
        assert out["n_image"].to_pylist() == [1, 0, 0]
        assert out["n_audio"].to_pylist() == [0, 1, 0]
        assert out["n_link"].to_pylist() == [1, 0, 0]
        assert out["offsets_monotonic"].to_pylist() == [True, True, True]

    def test_non_monotonic_flagged(self):
        spans = [[
            {"kind": "text", "text": "a", "media_ref": "", "offset": 5},
            {"kind": "text", "text": "b", "media_ref": "", "offset": 2},
        ]]
        t = pa.table({"doc_id": ["x"], "spans": pa.array(spans, pa.list_(SPAN_TYPE))})
        assert span_stats_batch(t)["offsets_monotonic"].to_pylist() == [False]


@pytest.mark.usefixtures("ray_session")
def test_crawl_doc_pipeline_query():
    from anansi_ray.pipelines.queries import q_crawl_doc_pipeline

    out = q_crawl_doc_pipeline("/root/testdata/sf0.001")
    assert out.num_rows > 50
    cols = set(out.column_names)
    assert {"doc_id", "n_spans", "punct_ratio", "n_tokens", "fp_md5"} <= cols
    # crawl fixture guarantees strictly increasing offsets
    from anansi_ray.functions.spans import span_stats_batch
    from anansi_ray.pipelines.queries import _crawl_results

    stats = span_stats_batch(_crawl_results()["documents"])
    assert all(stats["offsets_monotonic"].to_pylist())
