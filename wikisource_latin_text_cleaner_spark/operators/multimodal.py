"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB carries media alongside text. The Spark
shape is the important part -- schemas, partitioning, Arrow batch handling
through ``mapInPandas`` -- and is fully real here; the codec step is NOT:
this container has no image/audio libraries, so decoding is stubbed behind
``try: import PIL`` with a clearly-marked deterministic fake (features
derived from the payload bytes themselves). Swap ``_decode_image_real`` in
when Pillow exists; every schema and batch contract stays identical.

Schemas:
    media(doc_id long, media_type string, payload binary,
          meta struct<width int, height int, duration_ms int,
                      sample_rate int, format string>)

    image_features(doc_id long, width int, height int, n_bytes long,
                   mean_luma double, phash long)

    audio_features(doc_id long, duration_ms int, sample_rate int,
                   n_bytes long, rms double)

    video_frames(doc_id long, frame_idx int, frame_ts_ms int, frame binary)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<width int, height int, duration_ms int, "
    "sample_rate int, format string>"
)

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, n_bytes long, "
    "mean_luma double, phash long"
)

AUDIO_FEATURES_SCHEMA = (
    "doc_id long, duration_ms int, sample_rate int, n_bytes long, rms double"
)

VIDEO_FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_ts_ms int, frame binary"

try:  # pragma: no cover - not installed in this container
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _decode_image_real(payload: bytes) -> tuple[int, int, float]:  # pragma: no cover
    """Real decode path (requires Pillow). Not exercised in this sandbox."""
    raise NotImplementedError(
        "image decoding requires Pillow; this container ships without it -- "
        "the deterministic fake below exercises the identical Spark plumbing"
    )


def _payload_digest_hex(payload: bytes) -> str:
    """sha256 over the lowercase hex encoding of the payload -- a pure
    function of the bytes that DuckDB (whose hash functions accept only
    VARCHAR) replicates exactly as sha256(lower(hex(payload))), so the fake
    features below are oracle-checkable cross-engine."""
    return hashlib.sha256(payload.hex().encode()).hexdigest()


def _decode_image_fake(payload: bytes) -> tuple[int, int, float]:
    """DETERMINISTIC FAKE decoder: derives (width, height, mean_luma) from a
    digest of the payload so tests are stable and platform-independent."""
    d = _payload_digest_hex(payload)
    width = 64 + int(d[0:2], 16) % 192
    height = 64 + int(d[2:4], 16) % 192
    mean_luma = round(int(d[4:8], 16) / 65535.0, 6)
    return width, height, mean_luma


def _phash_fake(payload: bytes) -> int:
    """64-bit perceptual-hash stand-in: leading 60 bits of the payload
    digest (always positive, so it round-trips LongType and SQL alike)."""
    return int(_payload_digest_hex(payload)[:15], 16)


def extract_image_features(media: DataFrame) -> DataFrame:
    """media rows (media_type='image') -> image_features via mapInPandas.

    Arrow-batched; one output row per input row; the decode call is the only
    stubbed element (see module docstring)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _decode_image_real if _HAS_PIL else _decode_image_fake
        for pdf in it:
            feats = [decode(p or b"") for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "n_bytes": [len(p or b"") for p in pdf["payload"]],
                "mean_luma": [f[2] for f in feats],
                "phash": [_phash_fake(p or b"") for p in pdf["payload"]],
            })

    return (
        media.where(media.media_type == "image")
        .select("doc_id", "payload")
        .mapInPandas(batches, IMAGE_FEATURES_SCHEMA)
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """media rows (media_type='audio') -> audio_features. Duration/rate come
    from the meta struct (real); rms is the deterministic fake."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [p or b"" for p in pdf["payload"]]
            rms = [
                round(float(np.frombuffer(p, dtype=np.uint8).std()), 6) if p else 0.0
                for p in payloads
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "duration_ms": pdf["duration_ms"],
                "sample_rate": pdf["sample_rate"],
                "n_bytes": [len(p) for p in payloads],
                "rms": rms,
            })

    return (
        media.where(media.media_type == "audio")
        .select("doc_id", "payload", "meta.duration_ms", "meta.sample_rate")
        .mapInPandas(batches, AUDIO_FEATURES_SCHEMA)
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """media rows (media_type='video') -> one row per sampled frame.

    Frame extraction is faked (slices of the payload keyed by timestamp);
    the 1->N row fan-out through mapInPandas is the real contract a codec
    implementation must preserve."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for doc_id, payload, duration in zip(
                pdf["doc_id"], pdf["payload"], pdf["duration_ms"]
            ):
                payload = payload or b""
                n = max(1, int(duration or 0) // every_ms)
                for i in range(n):
                    lo = (i * len(payload)) // max(1, n)
                    hi = ((i + 1) * len(payload)) // max(1, n)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    out["frame"].append(payload[lo:hi])
            yield pd.DataFrame(out)

    return (
        media.where(media.media_type == "video")
        .select("doc_id", "payload", "meta.duration_ms")
        .mapInPandas(batches, VIDEO_FRAMES_SCHEMA)
    )


def _synth_media_rows(n_rows: int, seed: int = 42) -> list[tuple]:
    """Deterministic synthetic media rows (no external data)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        mt = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
        meta = (
            rng.randint(64, 4096) if mt == "image" else None,
            rng.randint(64, 4096) if mt == "image" else None,
            rng.randint(1000, 60000) if mt in ("audio", "video") else None,
            rng.choice((8000, 16000, 44100)) if mt == "audio" else None,
            {"image": "png", "audio": "wav", "video": "mp4"}[mt],
        )
        rows.append((i, mt, payload, meta))
    return rows


def synth_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (no external data)."""
    return spark.createDataFrame(_synth_media_rows(n_rows, seed), schema=MEDIA_SCHEMA)


def ensure_synth_media_parquet(path: str, n_rows: int, seed: int = 42) -> str:
    """Idempotently persist the synthetic media table as one parquet file
    (pyarrow; no Spark session needed), so a SQL oracle can scan the SAME
    bytes the Spark query reads. Returns ``path``."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    rows = _synth_media_rows(n_rows, seed)
    meta_type = pa.struct([
        ("width", pa.int32()), ("height", pa.int32()),
        ("duration_ms", pa.int32()), ("sample_rate", pa.int32()),
        ("format", pa.string()),
    ])
    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "media_type": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
        "meta": pa.array(
            [dict(zip(("width", "height", "duration_ms", "sample_rate", "format"),
                      r[3])) for r in rows],
            meta_type,
        ),
    })
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
