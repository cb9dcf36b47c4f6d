"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched Pandas operators.

Beyond-reference capability (the reference is text-only): a large-scale
training-data pipeline needs media columns to flow through the same
engine. Design:

  * **Data model** — one row per media object: `payload BINARY` plus a
    typed `meta STRUCT` (dims / sample rate / frame count / mime). The
    engine never interprets payloads JVM-side; only byte-length and
    metadata predicates run there (pushed down to parquet).
  * **Compute model** — decode / resize / frame-sample / embed are
    `mapInPandas` operators: Arrow moves the binary batches to Python
    once, the whole batch is processed vectorized, and the output schema
    is declared up front. No row-at-a-time UDFs.
  * **Decode: real where the stdlib suffices, stubbed where codecs
    are required** — binary PPM (P6) images are REALLY decoded by the
    validating pure-numpy codec at the bottom of this module (and
    `media_ppm_channel_stats` certifies the decoder against an
    analytic oracle); JPEG/PNG/audio/video need codec libraries this
    container doesn't ship, so for those `decode_media` raises
    NotImplementedError unless `fake=True`, which derives a
    deterministic ndarray from the payload bytes (stable across
    runs/partitions — safe for tests and oracles). The Spark-side
    plumbing (schemas, batch iteration, multi-row emission, partition
    sizing) is the real production shape either way.
  * **Scale** — media rows are large and skewed; operators repartition
    by `media_id` before mapInPandas so one giant object can't pin a
    partition, and batch size is governed by
    `spark.sql.execution.arrow.maxRecordsPerBatch` (set it so
    batch_rows × avg payload fits executor memory).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("mime", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)


def decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode one payload to an ndarray. Binary PPM (P6) payloads are
    REALLY decoded (pure-stdlib codec below — magic-sniffed, validating);
    codec-requiring formats (JPEG/PNG/audio/video) stay stubbed: the
    container ships no codec libraries (PIL/librosa/av), and `fake=True`
    yields a deterministic array derived from the payload bytes."""
    if kind == "image" and payload[:2] == b"P6":
        return parse_ppm(payload)
    if not fake:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic test codec "
            "(binary PPM images decode for real regardless)"
        )
    raw = np.frombuffer(payload, dtype=np.uint8)
    if raw.size == 0:
        raw = np.zeros(1, dtype=np.uint8)
    return raw


DECODE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", LongType()),  # scaled ×100, exact int
        StructField("n_frames", IntegerType()),
    ]
)


def decode_stats(media: DataFrame) -> DataFrame:
    """Decode each payload (fake codec) and emit per-object byte stats.
    Shows the canonical mapInPandas shape: schema declared up front,
    vectorized per-batch work, no driver collect."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            arrs = [
                decode_media(p, k, fake=True)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": [int(a.size) for a in arrs],
                    # mean scaled to an exact integer so hashes can't
                    # drift on float formatting.
                    "mean_byte": [
                        int(a.sum()) * 100 // int(a.size) for a in arrs
                    ],
                    "n_frames": pdf["meta"].map(
                        lambda m: m["n_frames"] if m is not None else 0
                    ).astype("int32"),
                }
            )

    return media.repartition("media_id").mapInPandas(
        batches, schema=DECODE_STATS_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_bytes", LongType()),
    ]
)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Sample every Nth frame of each video row — one OUTPUT row per
    sampled frame (mapInPandas emitting more rows than it receives, the
    explode-shaped UDF the multimodal path needs). Frame payload length
    is byte-count only under the stub codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "frame_no": [],
                "frame_bytes": [],
            }
            for _, row in pdf.iterrows():
                meta = row["meta"]
                n_frames = int(meta["n_frames"]) if meta is not None else 0
                if n_frames <= 0:
                    continue
                raw = decode_media(row["payload"], row["kind"], fake=True)
                per_frame = max(raw.size // n_frames, 1)
                for f in range(0, n_frames, every_n):
                    out["media_id"].append(int(row["media_id"]))
                    out["frame_no"].append(f)
                    out["frame_bytes"].append(per_frame)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "frame_no": pd.Series(out["frame_no"], dtype="int32"),
                    "frame_bytes": pd.Series(
                        out["frame_bytes"], dtype="int64"
                    ),
                }
            )

    videos = media.filter(F.col("kind") == "video")
    return videos.repartition("media_id").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image payloads to width x height x channels (stub codec:
    deterministic byte resampling — evenly-spaced source indices, the
    nearest-neighbor access pattern a real resize has). Non-image rows
    pass through untouched; metadata is rewritten to the new dims so
    downstream operators see a consistent contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = [], []
            for _, row in pdf.iterrows():
                meta = dict(row["meta"]) if row["meta"] is not None else {}
                if row["kind"] != "image":
                    payloads.append(row["payload"])
                    metas.append(row["meta"])
                    continue
                raw = decode_media(row["payload"], "image", fake=True)
                channels = int(meta.get("channels") or 1)
                n_out = width * height * channels
                idx = (
                    np.linspace(0, raw.size - 1, n_out).round().astype("int64")
                )
                payloads.append(raw[idx].tobytes())
                meta.update({"width": width, "height": height})
                metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.repartition("media_id").mapInPandas(
        batches, schema=RESIZE_SCHEMA
    )


EMBED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def embed_media(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake feature-extraction: payload bytes → fixed-dim
    float vector (histogram of byte values folded to `dim` buckets,
    L2-normalized). Stands in for a real encoder; vector layout matches
    the `embeddings` table so downstream ANN ops compose."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = []
            for p in pdf["payload"]:
                raw = decode_media(p, "any", fake=True)
                # float64 throughout: integer counts, one IEEE sqrt and
                # one IEEE division — bit-identical in any engine — then
                # ONE rounding to float32 at the schema boundary (Arrow
                # cast). Computing in float32 here would make the
                # division round differently than a float64 engine can
                # reproduce, which is what kept this rows-only through
                # round 11.
                hist = np.bincount(raw % dim, minlength=dim).astype(
                    "float64"
                )
                norm = float(np.sqrt(np.sum(hist * hist)))
                vecs.append((hist / norm if norm > 0 else hist).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "embedding": vecs,
                }
            )

    return media.repartition("media_id").mapInPandas(
        batches, schema=EMBED_SCHEMA
    )


# ---------------------------------------------------------------------------
# REAL decode: PPM (P6). The container ships no codec libraries, but
# binary PPM is a pure-stdlib format (ASCII header + raw RGB bytes), so
# the image path need not stay stubbed: `parse_ppm`/`encode_ppm` are a
# complete, validating codec — decode_media uses them for 'image/ppm'
# payloads and falls back to the stub contract for codec-requiring
# formats (JPEG/PNG/audio/video).
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary PPM (P6)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects an HxWx3 uint8 array")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def parse_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> HxWx3 uint8 ndarray. Validating: malformed
    magic, dims, maxval, or short pixel data raise ValueError."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # Header: magic, width, height, maxval — whitespace separated, then
    # exactly one whitespace byte before the raster.
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM: {w}x{h} maxval={maxval}")
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError(
            f"short PPM raster: need {need}, have {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


PPM_STATS_SCHEMA = (
    "media_id long, width int, height int, "
    "sum_r long, sum_g long, sum_b long"
)


def synth_ppm_payloads(ids: DataFrame) -> DataFrame:
    """(media_id) -> (media_id, payload): deterministic binary PPM
    images (W = 8 + id%5, H = 6 + id%3, flat pixel i =
    (id*7 + i*13) % 256) — closed-form pixels, so a SQL oracle can
    compute any decode statistic analytically while Spark round-trips
    through REAL image bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for m in pdf["media_id"]:
                m = int(m)
                w, h = 8 + m % 5, 6 + m % 3
                flat = (
                    m * 7 + np.arange(w * h * 3, dtype=np.int64) * 13
                ) % 256
                rows.append(
                    (m, encode_ppm(flat.astype(np.uint8).reshape(h, w, 3)))
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return ids.mapInPandas(batches, "media_id long, payload binary")


def ppm_channel_stats(payloads: DataFrame) -> DataFrame:
    """REAL image decode as a distributed operator: parse each binary
    PPM payload (validating header + raster), emit dimensions and
    exact per-channel pixel sums. Arrow-batched mapInPandas — bytes
    cross the boundary once per batch, the decode is vectorized
    numpy, and the output schema is declared up front."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                arr = parse_ppm(bytes(p))
                s = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out.append(
                    (
                        int(m),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        int(s[0]),
                        int(s[1]),
                        int(s[2]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "sum_r",
                    "sum_g",
                    "sum_b",
                ],
            )

    return payloads.mapInPandas(batches, PPM_STATS_SCHEMA)


def resize_ppm(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize of a binary PPM: decode, index-map
    (src = floor(dst * src_dim / dst_dim) — the standard NN grid), and
    re-encode. Pure numpy fancy-indexing; no codec libraries."""
    arr = parse_ppm(payload)
    h, w, _ = arr.shape
    ys = (np.arange(height, dtype=np.int64) * h) // height
    xs = (np.arange(width, dtype=np.int64) * w) // width
    return encode_ppm(arr[ys][:, xs])
