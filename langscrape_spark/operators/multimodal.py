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


# --------------------------------------------------------------------------
# perceptual hashing (REAL algorithm over decoded pixel arrays)
# --------------------------------------------------------------------------

def dhash64(pixels, w: int, h: int):
    """64-bit difference hash (dHash, the standard perceptual
    image-dedup fingerprint) over a grayscale pixel ARRAY column
    (row-major ``array<int>``, length ``w*h`` — the shape
    :func:`decode_images` produces once its buffer is unpacked, or
    any real decoder emits): nearest-neighbor downsample to a 9×8
    grid, one bit per horizontal gradient ``p[y][x] > p[y][x+1]``.
    Unlike the codec decode (faked in-sandbox), this IS the real
    algorithm — and it is pure codegen: 64 ``when`` terms over
    ``element_at``, no UDF, reproducible bit-for-bit in SQL.

    Returns a LONG column (bit b = grid row ``b//8``, gradient
    ``b%8``). Near-duplicate images differ in a few bits; exact
    duplicates collide exactly — pair up with :func:`dhash_pairs`.
    """
    from pyspark.sql import functions as F

    sx = [(k * w) // 9 for k in range(9)]
    sy = [(r * h) // 8 for r in range(8)]
    acc = F.lit(0).cast("long")
    for r in range(8):
        for x in range(8):
            i1 = sy[r] * w + sx[x]
            i2 = sy[r] * w + sx[x + 1]
            bit = r * 8 + x
            # bit 63's weight is -2^63 in two's complement (1 << 63
            # overflows a signed long literal; adding -2^63 sets the
            # sign bit exactly)
            weight = (1 << bit) if bit < 63 else -(1 << 63)
            acc = acc + F.when(
                F.element_at(pixels, i1 + 1)
                > F.element_at(pixels, i2 + 1),
                F.lit(weight).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
    return acc


def dhash_oracle_expr(pixels_sql: str, w: int, h: int) -> str:
    """DuckDB twin of :func:`dhash64` (same grid, same bit packing)
    as a SQL expression over a list-typed pixels expression."""
    sx = [(k * w) // 9 for k in range(9)]
    sy = [(r * h) // 8 for r in range(8)]
    terms = []
    for r in range(8):
        for x in range(8):
            i1 = sy[r] * w + sx[x]
            i2 = sy[r] * w + sx[x + 1]
            bit = r * 8 + x
            weight = (1 << bit) if bit < 63 else -(1 << 63)
            terms.append(
                f"CASE WHEN ({pixels_sql})[{i1 + 1}] >"
                f" ({pixels_sql})[{i2 + 1}]"
                f" THEN CAST({weight} AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
            )
    return "(" + " + ".join(terms) + ")"


def dhash_pairs(
    hashed: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_hamming: int = 10,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Near-duplicate image pairs from dHash fingerprints by the
    SimHash pigeonhole (q16's scheme, lifted to images): split the 64
    bits into 4 16-bit blocks — any pair within Hamming distance 3
    shares a block exactly; wider radii trade recall — bucket-join on
    (block_idx, block_value), then verify with the EXACT popcount of
    the XOR. Buckets larger than ``max_bucket`` are dropped whole
    (identical-image floods are exact-dedup's job first — the
    standing hot-bucket policy). Output ``(id_a, id_b, hamming)``,
    ``id_a < id_b``, distinct pairs.
    """
    from pyspark.sql import functions as F

    blocks = None
    for b in range(4):
        blk = hashed.select(
            F.col(id_col).alias("id"),
            F.col(hash_col).alias("hv"),
            F.lit(b).alias("blk"),
            F.shiftrightunsigned(F.col(hash_col), 16 * b)
            .bitwiseAND(F.lit(0xFFFF))
            .alias("bv"),
        )
        blocks = blk if blocks is None else blocks.unionByName(blk)
    sizes = blocks.groupBy("blk", "bv").agg(F.count(F.lit(1)).alias("n"))
    kept = blocks.join(
        F.broadcast(
            sizes.where(F.col("n") <= max_bucket).select("blk", "bv")
        ),
        ["blk", "bv"],
    )
    a = kept.select(
        "blk", "bv", F.col("id").alias("id_a"), F.col("hv").alias("ha")
    )
    b2 = kept.select(
        "blk", "bv", F.col("id").alias("id_b"), F.col("hv").alias("hb")
    )
    pairs = (
        a.join(b2, ["blk", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("ha").bitwiseXOR(F.col("hb"))
            ).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def audio_fingerprint64(samples, frames: int = 16, bands: int = 4,
                        band_w: int = 16):
    """64-bit audio fingerprint in the Haitsma–Kalker (2002) robust-
    hash style, integer-exact: the clip's sample array (``array<int>``
    PCM-ish values, the shape :func:`audio_features` consumes) is cut
    into ``frames+1`` frames of ``bands+1`` bands of ``band_w``
    samples; band energy = Σ|s| (exact LONG sum); bit (f,b) = 1 iff
    the band-energy difference ``E[f][b] − E[f][b+1]`` INCREASED vs
    the previous frame. Energy-difference signs survive volume
    scaling and mild noise — which is why this family (not raw-sample
    hashing) is the audio dedup standard. No FFT in-sandbox: bands
    are time-domain sample strides; the frame/band/difference/sign
    pipeline is the real algorithm and swaps onto spectral bands
    unchanged when a real decoder is registered.

    Pure codegen (aggregate lambdas over slices — no UDF); needs
    ``(frames+1)·(bands+1)·band_w`` samples (default 1360). Shorter
    arrays do NOT error — ``slice`` truncates, so trailing band
    energies degrade to sums over fewer samples (deterministic, but
    the tail bits carry less signal); callers wanting strictness
    filter on ``size(samples)`` first. Returns a LONG column; pair
    with :func:`dhash_pairs` (the pigeonhole blocker is
    fingerprint-agnostic).
    """
    from pyspark.sql import functions as F

    frame_w = (bands + 1) * band_w

    def energy(f: int, b: int):
        start = f * frame_w + b * band_w + 1
        return F.aggregate(
            F.slice(samples, start, band_w),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.abs(x),
        )

    acc = F.lit(0).cast("long")
    for f in range(1, frames + 1):
        for b in range(bands):
            bit = (f - 1) * bands + b
            weight = (1 << bit) if bit < 63 else -(1 << 63)
            diff_now = energy(f, b) - energy(f, b + 1)
            diff_prev = energy(f - 1, b) - energy(f - 1, b + 1)
            acc = acc + F.when(
                diff_now > diff_prev, F.lit(weight).cast("long")
            ).otherwise(F.lit(0).cast("long"))
    return acc


def audio_fp_oracle_expr(samples_sql: str, frames: int = 16,
                         bands: int = 4, band_w: int = 16) -> str:
    """DuckDB twin of :func:`audio_fingerprint64` (same frames/bands/
    differences/bit packing) over a list-typed samples expression."""
    frame_w = (bands + 1) * band_w

    def energy(f: int, b: int) -> str:
        start = f * frame_w + b * band_w + 1
        return (
            f"list_sum(list_transform(list_slice({samples_sql},"
            f" {start}, {start + band_w - 1}), x -> abs(x)))"
        )

    terms = []
    for f in range(1, frames + 1):
        for b in range(bands):
            bit = (f - 1) * bands + b
            weight = (1 << bit) if bit < 63 else -(1 << 63)
            terms.append(
                f"CASE WHEN ({energy(f, b)} - {energy(f, b + 1)})"
                f" > ({energy(f - 1, b)} - {energy(f - 1, b + 1)})"
                f" THEN CAST({weight} AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
            )
    return "(" + " + ".join(terms) + ")"
