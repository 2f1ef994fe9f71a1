"""Multimodal actor-pool stages: decode/feature (fake decode, real
plumbing), resize geometry, video frame sampling."""

import pyarrow as pa
import pytest
import ray.data as rd

from anansi_ray.functions import multimodal as M


class TestFitBox:
    def test_downscale_preserves_aspect(self):
        assert M.fit_box(1000, 500, 256, 256) == (256, 128)
        assert M.fit_box(500, 1000, 256, 256) == (128, 256)

    def test_never_upscales(self):
        assert M.fit_box(100, 50, 256, 256) == (100, 50)

    def test_degenerate(self):
        assert M.fit_box(0, 10, 256, 256) == (0, 0)
        assert M.fit_box(10000, 1, 256, 256) == (256, 1)  # floors to >=1


@pytest.mark.usefixtures("ray_session")
class TestResizeStage:
    def test_resize_images_passthrough_audio(self):
        ds = rd.from_arrow(M.synthesize_media_table(n=64, seed=42))
        out = M.resize_media(ds, max_w=128, max_h=128).to_pandas()
        src = M.synthesize_media_table(n=64, seed=42).to_pandas()
        out = out.set_index("media_id")
        for _, r in src.iterrows():
            o = out.loc[r["media_id"]]
            if r["kind"] == "image":
                assert o["meta_width"] <= 128 and o["meta_height"] <= 128
                if r["meta_width"] > 128 or r["meta_height"] > 128:
                    assert len(o["payload"]) != len(r["payload"])
            else:
                assert o["meta_width"] == r["meta_width"]
                assert bytes(o["payload"]) == bytes(r["payload"])

    def test_deterministic(self):
        ds = rd.from_arrow(M.synthesize_media_table(n=32, seed=1))
        a = M.resize_media(ds, 64, 64).to_pandas().sort_values("media_id")
        ds2 = rd.from_arrow(M.synthesize_media_table(n=32, seed=1))
        b = M.resize_media(ds2, 64, 64).to_pandas().sort_values("media_id")
        assert [bytes(x) for x in a["payload"]] == [bytes(x) for x in b["payload"]]


@pytest.mark.usefixtures("ray_session")
class TestFrameSampler:
    def test_row_expansion_and_timestamps(self):
        vids = M.synthesize_video_table(n=16, seed=7)
        out = M.sample_frames(rd.from_arrow(vids), n_frames=4).to_pandas()
        assert len(out) == 16 * 4
        durs = dict(zip(vids["media_id"].to_pylist(), vids["meta_duration_ms"].to_pylist()))
        for mid, grp in out.groupby("media_id"):
            g = grp.sort_values("frame_idx")
            assert g["frame_idx"].tolist() == [0, 1, 2, 3]
            ts = g["t_ms"].tolist()
            d = durs[mid]
            # center-of-bin even spacing, strictly increasing, inside clip
            assert ts == sorted(ts) and 0 <= ts[0] and ts[-1] < d
            assert ts[0] == int(d * 1 / 8) and ts[3] == int(d * 7 / 8)

    def test_features_deterministic_and_shaped(self):
        vids = M.synthesize_video_table(n=4, seed=7)
        a = M.sample_frames(rd.from_arrow(vids), n_frames=2).to_pandas()
        b = M.sample_frames(rd.from_arrow(vids), n_frames=2).to_pandas()
        key = ["media_id", "frame_idx"]
        a, b = a.sort_values(key), b.sort_values(key)
        assert a["feature"].apply(len).eq(M.FEATURE_DIM).all()
        assert [list(x) for x in a["feature"]] == [list(x) for x in b["feature"]]

    def test_non_video_rows_dropped(self):
        media = M.synthesize_media_table(n=16, seed=42)
        media = media.append_column(
            "meta_duration_ms", pa.array([0] * 16, pa.int64())
        )
        out = M.sample_frames(rd.from_arrow(media), n_frames=3).to_pandas()
        assert len(out) == 0


class TestDecodeReal:
    """decode_real is self-healing on optional imports: real codecs when
    PIL/soundfile exist, NotImplementedError (and the deterministic fake
    pipeline) when they don't — unit-tested both ways, whichever host."""

    def test_image_path(self):
        if M.HAVE_IMAGE_CODEC:
            import io

            from PIL import Image

            buf = io.BytesIO()
            Image.new("RGB", (4, 3), (10, 20, 30)).save(buf, format="PNG")
            arr = M.decode_real(buf.getvalue(), "image")
            assert arr.shape == (3, 4, 3) and arr[0, 0, 2] == 30
        else:
            with pytest.raises(NotImplementedError):
                M.decode_real(b"\x89PNG", "image")

    def test_audio_path(self):
        if M.HAVE_AUDIO_CODEC:
            import io

            import numpy as np
            import soundfile as sf

            buf = io.BytesIO()
            sf.write(buf, np.zeros(16), 8000, format="WAV")
            arr = M.decode_real(buf.getvalue(), "audio")
            assert len(arr) == 16
        else:
            with pytest.raises(NotImplementedError):
                M.decode_real(b"RIFF", "audio")

    def test_video_always_raises(self):
        with pytest.raises(NotImplementedError):
            M.decode_real(b"", "video")

    def test_extractor_real_path_gated(self):
        if M.HAVE_IMAGE_CODEC and M.HAVE_AUDIO_CODEC:
            ext = M.MediaFeatureExtractor(use_fake=False)
            assert ext.use_fake is False
        else:
            with pytest.raises(NotImplementedError):
                M.MediaFeatureExtractor(use_fake=False)

    def test_real_features_pooling_shape(self):
        # the pooling kernel itself is codec-independent: feed it through
        # a monkeypatched decode so the real-path feature math is covered
        # on any host
        import numpy as np

        orig = M.decode_real
        try:
            M.decode_real = lambda p, k: np.arange(64, dtype=np.float64)
            f = M._real_features(b"x", "image")
            assert f.shape == (M.FEATURE_DIM,)
            assert f[0] == np.arange(64).reshape(M.FEATURE_DIM, -1)[0].mean()
        finally:
            M.decode_real = orig
