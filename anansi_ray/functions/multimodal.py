"""Multimodal column handling: opaque binary payloads + typed metadata.

Image/audio/video are carried as ``binary`` columns with a ``kind`` tag and
a metadata struct; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages (model/codec loaded once per actor in
``__init__``).

The image/audio codec libraries are NOT in this container, so the decode
step is STUBBED: ``decode_real`` raises ``NotImplementedError`` and the
pipeline runs a clearly-marked deterministic fake decoder instead.  The
Ray-side plumbing — schema, batch size, actor signature, output layout — is
real and tested; swapping in PIL/ffmpeg is a one-function change.

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


def decode_real(payload: bytes, kind: str):
    """The real decode hook — requires PIL / soundfile / ffmpeg, none of
    which exist in this container."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; the pipeline uses the deterministic fake decoder "
        "(MediaFeatureExtractor(use_fake=True))"
    )


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
        if not use_fake:
            decode_real(b"", "image")  # raises: real codecs unavailable here
        self.use_fake = use_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            _fake_features(p, k)
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
