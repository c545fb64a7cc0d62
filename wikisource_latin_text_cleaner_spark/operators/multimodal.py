"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB carries media alongside text. The Spark
shape is the important part -- schemas, partitioning, Arrow batch handling
through ``mapInPandas`` -- and is fully real here. The codec step is real
for PNG: a dependency-free stdlib decoder (``decode_png``: zlib inflate +
full scanline unfilter incl. Paeth) and encoder (``encode_png``) cover the
format the synthetic fixtures actually use, so ``extract_image_features``
decodes PNG payloads for real (width/height/mean-luma from pixels). Other
formats remain gated behind ``try: import PIL`` with a clearly-marked
deterministic fake (features derived from the payload bytes themselves);
every schema and batch contract is identical across the three paths.

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


# -- stdlib PNG codec (the real decode path for the fixture format) ----------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type (8-bit, non-interlaced support)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal stdlib PNG encoder: 8-bit grayscale (H,W), gray+alpha
    (H,W,2), RGB (H,W,3) or RGBA (H,W,4), non-interlaced, one IDAT. The
    SAME ``filter_type`` (0-4) is applied to every scanline so tests can
    exercise each unfilter path of ``decode_png`` deliberately."""
    import struct
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        h, w, ch, color_type = a.shape[0], a.shape[1], 1, 0
        flat = a.reshape(h, w)
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        h, w, ch = a.shape
        color_type = {2: 4, 3: 2, 4: 6}[ch]
        flat = a
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0-4, got {filter_type}")

    bpp = ch
    raw = bytearray()
    prev = bytes(w * ch)
    for y in range(h):
        line = flat[y].tobytes()
        raw.append(filter_type)
        if filter_type == 0:
            raw += line
        else:
            for x in range(len(line)):
                left = line[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if filter_type == 1:
                    pred = left
                elif filter_type == 2:
                    pred = up
                elif filter_type == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                raw.append((line[x] - pred) & 0xFF)
        prev = line

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Stdlib PNG decoder: 8-bit depth, color types 0/2/4/6, non-interlaced
    (exactly what ``encode_png`` and the synthetic fixtures produce; the
    common web-thumbnail envelope). Returns uint8 (H,W) for grayscale or
    (H,W,C) otherwise. Raises ValueError on anything outside the envelope
    so the caller can fall through to the PIL gate."""
    import struct
    import zlib

    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    ch = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color_type}, "
                    f"interlace={interlace})"
                )
            ch = _PNG_CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")

    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")

    bpp = ch
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if f == 1:
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + (left + prev[x]) // 2) & 0xFF
        elif f == 4:
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter {f}")
        prev = bytes(line)
        out += line

    arr = np.frombuffer(bytes(out), dtype=np.uint8)
    if ch == 1:
        return arr.reshape(height, width)
    return arr.reshape(height, width, ch)


def _decode_image_real(payload: bytes) -> tuple[int, int, float]:
    """Real decode path: stdlib PNG decoder for PNG payloads (always
    available); Pillow for other formats when installed. Luma is computed
    per-channel-mean first (integer sums are exact in float64), then
    combined with the Rec.601 weights in the SAME expression order the SQL
    oracle uses, so constant-color fixtures agree bit-for-bit."""
    if payload[:8] == PNG_MAGIC:
        arr = decode_png(payload)
        h, w = arr.shape[:2]
        if arr.ndim == 2:
            luma = round(float(arr.mean()) / 255.0, 6)
        elif arr.shape[2] == 2:  # gray + alpha: luma from the gray channel
            luma = round(float(arr[:, :, 0].mean()) / 255.0, 6)
        else:  # RGB / RGBA: Rec.601 over the first three channels
            r = float(arr[:, :, 0].mean())
            g = float(arr[:, :, 1].mean())
            b = float(arr[:, :, 2].mean())
            luma = round((0.299 * r + 0.587 * g + 0.114 * b) / 255.0, 6)
        return w, h, luma
    if _HAS_PIL:  # pragma: no cover - Pillow absent in this container
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(payload))
        gray = np.asarray(img.convert("L"), dtype=np.float64)
        return img.width, img.height, round(float(gray.mean()) / 255.0, 6)
    raise NotImplementedError(
        "non-PNG image decoding requires Pillow; this container ships "
        "without it -- the deterministic fake exercises the identical "
        "Spark plumbing for those formats"
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

    Arrow-batched; one output row per input row. PNG payloads take the
    REAL stdlib decode path (pixels in, features out); other formats take
    Pillow when present, else the clearly-marked deterministic fake (see
    module docstring)."""

    def decode(p: bytes) -> tuple[int, int, float]:
        if p[:8] == PNG_MAGIC or _HAS_PIL:
            return _decode_image_real(p)
        return _decode_image_fake(p)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
    """Deterministic synthetic media rows (no external data).

    Image payloads are REAL PNGs (``encode_png``) so the real decode path
    runs end-to-end: constant-color images whose dimensions and color are
    md5(doc_id)-derived -- a pure function a SQL oracle reproduces without
    decoding -- with the scanline filter rotated through all five PNG
    filter types (doc_id % 5) so every unfilter branch executes in the
    oracle-checked path. Even doc_ids are grayscale (color type 0), odd
    RGB (color type 2); ``meta.width/height`` record the true dimensions,
    which the decoder must re-derive from the pixels. Audio/video payloads
    stay seeded random bytes (their features never decode the payload)."""
    import hashlib
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        mt = ("image", "audio", "video")[i % 3]
        if mt == "image":
            d = hashlib.md5(str(i).encode()).hexdigest()
            w = 8 + int(d[0:2], 16) % 25
            h = 8 + int(d[2:4], 16) % 25
            if i % 2 == 0:
                gray = int(d[4:6], 16)
                arr = np.full((h, w), gray, dtype=np.uint8)
            else:
                rgb = (int(d[4:6], 16), int(d[6:8], 16), int(d[8:10], 16))
                arr = np.full((h, w, 3), rgb, dtype=np.uint8)
            payload = encode_png(arr, filter_type=i % 5)
            meta = (w, h, None, None, "png")
        else:
            payload = bytes(
                rng.getrandbits(8) for _ in range(rng.randint(64, 512))
            )
            meta = (
                None,
                None,
                rng.randint(1000, 60000),
                rng.choice((8000, 16000, 44100)) if mt == "audio" else None,
                {"audio": "wav", "video": "mp4"}[mt],
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
