"""Multimodal column handling: opaque binary payloads + typed metadata.

Image/audio/video are carried as ``binary`` columns with a ``kind`` tag and
a metadata struct; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages (model/codec loaded once per actor in
``__init__``).

The image/audio codec libraries are NOT in this container, so the decode
step is gated on optional imports: ``decode_real`` routes through
PIL/soundfile when they exist and raises ``NotImplementedError`` otherwise,
and the pipeline runs a clearly-marked deterministic fake decoder in that
case.  The Ray-side plumbing — schema, batch size, actor signature, output
layout — is real and tested both ways.

Scale notes: binary payload batches are kept small (``batch_size`` tuned to
payload size so batch × concurrency fits worker heaps); features, not
payloads, flow downstream (payloads never shuffle — same rule as crawl
payloads, SURVEY §7.4).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("kind", pa.string()),  # image | audio
        pa.field("payload", pa.binary()),
        pa.field("meta_width", pa.int32()),
        pa.field("meta_height", pa.int32()),
        pa.field("meta_sample_rate", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synthesize_media_table(n: int = 256, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table (no external data): payload bytes
    derived from blake2b(media_id), sizes/rates from a seeded RNG."""
    rng = np.random.default_rng(seed)
    ids, kinds, payloads, w, h, sr = [], [], [], [], [], []
    for i in range(n):
        mid = f"m{i:06d}"
        kind = "image" if i % 3 else "audio"
        size = int(rng.integers(64, 4096))
        blob = hashlib.blake2b(mid.encode(), digest_size=32).digest()
        payloads.append((blob * (size // 32 + 1))[:size])
        ids.append(mid)
        kinds.append(kind)
        if kind == "image":
            w.append(int(rng.integers(16, 512)))
            h.append(int(rng.integers(16, 512)))
            sr.append(0)
        else:
            w.append(0)
            h.append(0)
            sr.append(int(rng.choice([8000, 16000, 44100])))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_width": pa.array(w, pa.int32()),
            "meta_height": pa.array(h, pa.int32()),
            "meta_sample_rate": pa.array(sr, pa.int32()),
        }
    )


# Optional codec imports: absent in this container, but if the repo ever
# runs on a richer host the real decode path lights up without a code
# change (the deterministic fake stays the fallback + the oracle twin).
try:  # pragma: no cover - exercised only where PIL exists
    from PIL import Image as _pil_image
except ImportError:
    _pil_image = None
try:  # pragma: no cover - exercised only where soundfile exists
    import soundfile as _soundfile
except ImportError:
    _soundfile = None

HAVE_IMAGE_CODEC = _pil_image is not None
HAVE_AUDIO_CODEC = _soundfile is not None


def decode_real(payload: bytes, kind: str) -> np.ndarray:
    """The real decode hook: image → HxWxC uint8 array via PIL, audio →
    float sample array via soundfile.  Raises ``NotImplementedError`` when
    the codec library is absent (this container has neither), in which
    case the pipeline uses the deterministic fake decoder
    (``MediaFeatureExtractor(use_fake=True)``)."""
    import io

    if kind == "image":
        if _pil_image is None:
            raise NotImplementedError(
                "image decode requires PIL, not present in this environment; "
                "use the deterministic fake decoder (use_fake=True)"
            )
        img = _pil_image.open(io.BytesIO(payload))
        img.load()
        return np.asarray(img)
    if kind == "audio":
        if _soundfile is None:
            raise NotImplementedError(
                "audio decode requires soundfile, not present in this "
                "environment; use the deterministic fake decoder "
                "(use_fake=True)"
            )
        data, _sr = _soundfile.read(io.BytesIO(payload))
        return np.asarray(data, dtype=np.float64)
    raise NotImplementedError(f"no codec for kind={kind!r} (video needs ffmpeg)")


def _real_features(payload: bytes, kind: str) -> np.ndarray:
    """Feature extraction over a REAL decode: pool the decoded sample/pixel
    array into FEATURE_DIM bucket means (a stand-in for a learned encoder;
    deterministic given the decoded array)."""
    arr = decode_real(payload, kind).astype(np.float64).ravel()
    if arr.size == 0:
        return np.zeros(FEATURE_DIM)
    pad = (-arr.size) % FEATURE_DIM
    if pad:
        arr = np.pad(arr, (0, pad))
    return np.round(arr.reshape(FEATURE_DIM, -1).mean(axis=1), 6)


def _fake_features(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake 'decode + feature-extract': FEATURE_DIM floats
    derived from SHA-256 over ``kind || hex(payload)``.  Stands in for e.g.
    a CLIP embedding; stable across processes/machines, and — because
    DuckDB's ``sha256`` accepts only VARCHAR — recomputable by the SQL
    oracle as ``sha256(kind || lower(to_hex(payload)))``."""
    base = (kind + payload.hex()).encode()
    d = hashlib.sha256(base).digest() + hashlib.sha256(base + b"\x01").digest()
    arr = np.frombuffer(d[: FEATURE_DIM * 4], dtype=">u4").astype(np.float64)
    return np.round(arr / np.float64(2**32), 6)


class MediaFeatureExtractor:
    """Actor-pool stage: decode media payloads and emit feature vectors.

    Use as ``ds.map_batches(MediaFeatureExtractor, fn_constructor_kwargs=
    {"use_fake": True}, concurrency=N, batch_size=small, num_cpus=1,
    batch_format="pyarrow")``.  Codec/model state loads once per actor.
    """

    def __init__(self, use_fake: bool = True):
        if not use_fake and not (HAVE_IMAGE_CODEC and HAVE_AUDIO_CODEC):
            # surface the codec-specific NotImplementedError at actor
            # construction, not mid-stream
            decode_real(b"", "image" if not HAVE_IMAGE_CODEC else "audio")
        self.use_fake = use_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        extract = _fake_features if self.use_fake else _real_features
        feats = [
            extract(p, k)
            for p, k in zip(batch["payload"].to_pylist(), batch["kind"].to_pylist())
        ]
        # pass through every non-payload column (doc_id joins, positions,
        # ...); the binary payload never flows downstream of the decode
        cols = {
            name: batch[name]
            for name in batch.column_names
            if name not in ("payload", "meta_width", "meta_height", "meta_sample_rate")
        }
        cols["payload_bytes"] = pa.array(
            [len(p) for p in batch["payload"].to_pylist()], pa.int64()
        )
        cols["feature"] = pa.array([f.tolist() for f in feats], pa.list_(pa.float64()))
        return pa.table(cols)


def extract_media_features(ds: rd.Dataset, concurrency: int = 2) -> rd.Dataset:
    """The full stage wiring: small batches (binary payloads), actor pool."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"use_fake": True},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, concurrency),
    )


# ---------------------------------------------------------------------------
# Resize + frame-sample stages (the remaining multimodal verbs of the
# training-data brief).  The Ray-side plumbing — schemas, batch protocol,
# actor state, output layout — is real and tested; only the codec byte
# work is a clearly-marked deterministic fake (decode_real documents why).
# ---------------------------------------------------------------------------


def fit_box(w: int, h: int, max_w: int, max_h: int) -> tuple[int, int]:
    """Aspect-preserving fit of (w, h) into (max_w, max_h): the real resize
    arithmetic every image pipeline needs, independent of the codec.
    Never upscales; floors to ≥1 px."""
    if w <= 0 or h <= 0:
        return 0, 0
    scale = min(max_w / w, max_h / h, 1.0)
    return max(1, int(w * scale)), max(1, int(h * scale))


class MediaResizer:
    """Actor-pool stage: 'decode → resize → re-encode' for image rows.

    Real parts: aspect-preserving geometry, per-actor setup, small-batch
    binary handling, non-image passthrough.  Fake part: the re-encoded
    payload is a deterministic sha256 stream sized ~w*h/16 (a plausible
    thumbnail byte count), since no image codec exists in this container.
    """

    def __init__(self, max_w: int = 256, max_h: int = 256, use_fake: bool = True):
        if not use_fake:
            raise NotImplementedError(
                "real resize needs a decode + re-encode round-trip; only the "
                "deterministic fake re-encode is wired (use_fake=True)"
            )
        self.max_w = max_w
        self.max_h = max_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        ws = batch["meta_width"].to_pylist()
        hs = batch["meta_height"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_w, out_h, out_p = [], [], []
        for kind, w, h, p in zip(kinds, ws, hs, payloads):
            if kind != "image":
                out_w.append(w)
                out_h.append(h)
                out_p.append(p)
                continue
            nw, nh = fit_box(w, h, self.max_w, self.max_h)
            out_w.append(nw)
            out_h.append(nh)
            want = max(16, (nw * nh) // 16)
            seed = hashlib.sha256(p).digest()
            out_p.append((seed * (want // 32 + 1))[:want])
        cols = {n: batch[n] for n in batch.column_names if n != "payload"}
        cols["meta_width"] = pa.array(out_w, pa.int32())
        cols["meta_height"] = pa.array(out_h, pa.int32())
        cols["payload"] = pa.array(out_p, pa.binary())
        return pa.table(cols)


def resize_media(ds: rd.Dataset, max_w: int = 256, max_h: int = 256, concurrency: int = 2) -> rd.Dataset:
    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"max_w": max_w, "max_h": max_h},
        batch_format="pyarrow",
        batch_size=64,          # binary payloads: keep batch × concurrency small
        concurrency=(1, concurrency),
    )


class FrameSampler:
    """Actor-pool stage: video rows → N evenly-spaced frame rows.

    Real parts: the 1→N row expansion inside map_batches (rows carry
    (media_id, frame_idx, t_ms)), even-spacing timestamp math over the
    clip duration, per-actor setup.  Fake part: the 'decoded frame'
    feature vector reuses the deterministic sha-based extractor keyed by
    (payload, t_ms)."""

    def __init__(self, n_frames: int = 4, use_fake: bool = True):
        if not use_fake:
            decode_real(b"", "video")  # always raises: video needs ffmpeg
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, ts, feats = [], [], [], []
        for mid, kind, p, dur in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["meta_duration_ms"].to_pylist(),
        ):
            if kind != "video" or not dur:
                continue
            k = self.n_frames
            for j in range(k):
                # even spacing, first frame at t=dur/(2k) (center-of-bin)
                t = int(dur * (2 * j + 1) / (2 * k))
                ids.append(mid)
                idxs.append(j)
                ts.append(t)
                feats.append(_fake_features(p + str(t).encode(), "video").tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "t_ms": pa.array(ts, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def sample_frames(ds: rd.Dataset, n_frames: int = 4, concurrency: int = 2) -> rd.Dataset:
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, concurrency),
    )


def synthesize_video_table(n: int = 64, seed: int = 7) -> pa.Table:
    """Deterministic synthetic video rows: opaque payload + duration/fps
    metadata (the brief's 'video as opaque binary + typed metadata')."""
    rng = np.random.default_rng(seed)
    ids, payloads, dur, fps = [], [], [], []
    for i in range(n):
        mid = f"v{i:06d}"
        size = int(rng.integers(256, 8192))
        blob = hashlib.sha256(mid.encode()).digest()
        payloads.append((blob * (size // 32 + 1))[:size])
        ids.append(mid)
        dur.append(int(rng.integers(1000, 120_000)))
        fps.append(float(rng.choice([24.0, 25.0, 30.0])))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "kind": pa.array(["video"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_duration_ms": pa.array(dur, pa.int64()),
            "meta_fps": pa.array(fps, pa.float64()),
        }
    )
