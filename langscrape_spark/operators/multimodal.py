"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The reference pipeline is text/HTML-only (its only binary path is the
PDF fetch, ``/root/reference/langscrape/pdf/pdf_utils.py:22-34``), but
a training-data engine at 100 TB needs the same pattern for media: the
payload stays an opaque ``binary`` column, metadata is a typed struct,
and every transform is a batch function that never materializes more
than one Arrow batch of payloads at a time (the session pins
``arrow.maxRecordsPerBatch`` low for exactly this reason).

Codec note — **the actual codec decode is a deterministic fake**:
image/audio/video libraries are not available in this environment, so
``_decode_payload`` derives a pseudo-pixel/sample buffer from a
blake2b stream over the payload. Every shape that matters to Spark —
schemas, partitioning, batch iteration, explode cardinality — is real
and tested; swapping ``_decode_payload`` for PIL/ffmpeg is a
one-function change (see ``REAL_DECODERS``).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

# Schema of the media table this module operates on.
MEDIA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, "
    "sample_rate:int, duration_ms:int>"
)

DECODED_DDL = "media_id long, kind string, width int, height int, pixels binary"
RESIZED_DDL = "media_id long, width int, height int, pixels binary"
FRAMES_DDL = "media_id long, frame_idx int, width int, height int, pixels binary"
AUDIO_FEATURES_DDL = (
    "media_id long, n_windows int, rms array<double>, zero_crossings int"
)

#: Set to a dict of kind -> callable(payload: bytes, meta: dict) -> bytes
#: to replace the fake decode with real codecs (PIL / soundfile /
#: pyav). Left empty in this environment. Registration is snapshotted
#: when a transform BUILDS its plan (the decoder rides the pickled
#: closure to executors — a worker-side module re-import never sees
#: driver mutations, so an in-generator lookup would silently keep the
#: fake; pinned by test_multimodal_decoder_seam). Register before
#: calling the transform. For ``video`` the callable receives the
#: frame index as ``meta["frame_idx"]``.
REAL_DECODERS: dict = {}


def _decode_payload(payload: bytes, n_bytes: int) -> bytes:
    """DETERMINISTIC FAKE of a codec decode (see module docstring):
    expands the payload into ``n_bytes`` pseudo-decoded bytes via a
    blake2b counter stream keyed by the payload digest. Stable across
    processes/partitions, so goldens are reproducible cluster-wide."""
    seed = hashlib.blake2b(payload, digest_size=16).digest()
    out = bytearray()
    counter = 0
    while len(out) < n_bytes:
        out += hashlib.blake2b(
            seed + counter.to_bytes(8, "big"), digest_size=64
        ).digest()
        counter += 1
    return bytes(out[:n_bytes])


# --------------------------------------------------------------------------
# transforms (each: DataFrame -> DataFrame via mapInPandas)
# --------------------------------------------------------------------------

def decode_images(media: DataFrame) -> DataFrame:
    """image rows -> grayscale pixel buffer (width*height bytes)."""
    # snapshot at plan-build time: ships with the closure (see
    # REAL_DECODERS note)
    decode = REAL_DECODERS.get("image")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                w, h = int(r.meta["width"]), int(r.meta["height"])
                px = (
                    decode(bytes(r.payload), r.meta)
                    if decode
                    else _decode_payload(bytes(r.payload), w * h)
                )
                rows.append((r.media_id, "image", w, h, px))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "width", "height", "pixels"]
            )

    return media.mapInPandas(gen, schema=DECODED_DDL)


def resize_images(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize over the grayscale buffer — this part is
    a *real* algorithm (not faked): output pixel (x,y) samples input
    pixel (x*w//out_w, y*h//out_h)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h = int(r.width), int(r.height)
                src = bytes(r.pixels)
                buf = bytearray(out_w * out_h)
                for y in range(out_h):
                    sy = y * h // out_h
                    row_off = sy * w
                    for x in range(out_w):
                        buf[y * out_w + x] = src[row_off + (x * w // out_w)]
                rows.append((r.media_id, out_w, out_h, bytes(buf)))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "pixels"]
            )

    return decoded.mapInPandas(gen, schema=RESIZED_DDL)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """video rows -> one row per sampled frame (frame 0, n, 2n, ...).
    Explode happens *inside* the batch function so a 10k-frame video
    never builds a driver-side list."""
    decode = REAL_DECODERS.get("video")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                w, h = int(r.meta["width"]), int(r.meta["height"])
                n_frames = int(r.meta["n_frames"])
                for idx in range(0, n_frames, every_n):
                    if decode:
                        frame = decode(
                            bytes(r.payload), {**r.meta, "frame_idx": idx}
                        )
                    else:
                        frame = _decode_payload(
                            bytes(r.payload) + idx.to_bytes(4, "big"), w * h
                        )
                    rows.append((r.media_id, idx, w, h, frame))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "width", "height", "pixels"],
            )

    return media.mapInPandas(gen, schema=FRAMES_DDL)


def audio_features(media: DataFrame, window: int = 1024) -> DataFrame:
    """audio rows -> per-window RMS + zero-crossing count over the
    decoded sample buffer (samples = centered uint8). The feature math
    is real; only the codec decode is the deterministic fake."""
    decode = REAL_DECODERS.get("audio")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "audio":
                    continue
                sr = int(r.meta["sample_rate"])
                n = max(window, sr * int(r.meta["duration_ms"]) // 1000)
                raw = (
                    decode(bytes(r.payload), r.meta)
                    if decode
                    else _decode_payload(bytes(r.payload), n)
                )
                x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
                n_win = len(x) // window
                xw = x[: n_win * window].reshape(n_win, window)
                rms = [round(float(v), 6) for v in np.sqrt((xw**2).mean(axis=1))]
                zc = int(((x[:-1] * x[1:]) < 0).sum())
                rows.append((r.media_id, n_win, rms, zc))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_windows", "rms", "zero_crossings"]
            )

    return media.mapInPandas(gen, schema=AUDIO_FEATURES_DDL)


# --------------------------------------------------------------------------
# deterministic synthetic media table (tests/bench input)
# --------------------------------------------------------------------------

def build_media_df(spark, n_rows: int, partitions: int = 8) -> DataFrame:
    """Distributed generator, same pure-function pattern as
    ``synth.build_pages_df``: every row derivable from its id alone."""

    kinds = ["image", "audio", "video"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"].tolist():
                kind = kinds[mid % 3]
                payload = hashlib.blake2b(
                    f"media:{mid}".encode(), digest_size=32
                ).digest() * (1 + mid % 4)
                meta = {
                    "width": 16 + (mid % 5) * 8,
                    "height": 16 + (mid % 3) * 8,
                    "n_frames": 30 + (mid % 7) * 10 if kind == "video" else 0,
                    "sample_rate": 8000 if kind == "audio" else 0,
                    "duration_ms": 250 + (mid % 4) * 125 if kind == "audio" else 0,
                }
                rows.append((mid, kind, payload, meta))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return spark.range(0, n_rows, 1, partitions).mapInPandas(gen, schema=MEDIA_DDL)
