"""Registered multimodal queries. The media table is synthesized from
`documents` (payload = UTF-8 bytes of the text, kind/meta derived from
doc residues), so even the mapInPandas decode path has an exact DuckDB
oracle: payload bytes are ASCII codes the oracle can sum with
list_transform/ascii. That verifies the Arrow batch plumbing — schema,
multi-row emission, byte handling — not just the JVM-side metadata."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from newsflow.multimodal.media import (
    decode_stats,
    embed_media,
    frame_sample,
)
from newsflow.registry import register
from newsflow.tables import load_table

_KINDS = ("image", "audio", "video")


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → MEDIA_SCHEMA frame (deterministic)."""
    docs = load_table(spark, sf_dir, "documents")
    m3 = F.col("doc_id") % 3
    kind = (
        F.when(m3 == 0, "image").when(m3 == 1, "audio").otherwise("video")
    )
    n_frames = (
        F.when(m3 == 2, (F.col("n_chars") % 40 + 1)).otherwise(0)
    ).cast("int")
    meta = F.struct(
        F.lit(64).alias("width"),
        F.lit(48).alias("height"),
        F.lit(3).alias("channels"),
        F.when(m3 == 1, 16000).otherwise(0).cast("int").alias("sample_rate"),
        n_frames.alias("n_frames"),
        F.concat(F.lit("x-fake/"), kind).alias("mime"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


# DuckDB expression: n_frames by the same construction.
_SQL_NFRAMES = (
    "CASE WHEN doc_id % 3 = 2 THEN (n_chars % 40 + 1) ELSE 0 END"
)
_SQL_KIND = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'"
    " ELSE 'video' END"
)


@register(
    "media_decode_stats",
    oracle=f"""
    SELECT doc_id AS media_id,
           {_SQL_KIND} AS kind,
           octet_length(encode(text)) AS n_bytes,
           CAST(list_sum(list_transform(string_split(text, ''),
                                        c -> ascii(c)))
                * 100 // octet_length(encode(text)) AS BIGINT) AS mean_byte,
           CAST({_SQL_NFRAMES} AS INT) AS n_frames
    FROM documents
    """,
    tags=("multimodal",),
)
def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode → per-object stats via mapInPandas (Arrow batches,
    declared schema). The oracle recomputes the byte arithmetic from the
    source text, proving the batch path end-to-end."""
    return decode_stats(synth_media(spark, sf_dir))


@register(
    "media_frame_sample",
    oracle=f"""
    WITH vids AS (
      SELECT doc_id AS media_id,
             CAST({_SQL_NFRAMES} AS INT) AS n_frames,
             octet_length(encode(text)) AS n_bytes
      FROM documents
      WHERE doc_id % 3 = 2
    )
    SELECT media_id,
           CAST(u.f AS INT) AS frame_no,
           greatest(n_bytes // n_frames, 1) AS frame_bytes
    FROM vids, UNNEST(range(0, n_frames, 10)) AS u(f)
    WHERE n_frames > 0
    """,
    tags=("multimodal",),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one output row per sampled frame — the
    explode-shaped mapInPandas operator (emits more rows than it
    receives)."""
    return frame_sample(synth_media(spark, sf_dir), every_n=10)


_MEDIA_EMBED_ORACLE = """
    WITH b AS (
      -- UTF-8 BYTES, not codepoints (ADVICE r12): the Spark side
      -- histograms np.frombuffer(text.encode()), so the oracle walks
      -- hex(encode(text)) two nibbles at a time — exact byte parity
      -- for ANY unicode text, where the old ascii(substr(text,i,1))
      -- form silently held only for an all-ASCII corpus. The
      -- GREATEST(...,1) + COALESCE(...,0) pair is NOT a phantom: it
      -- replicates decode_media's explicit empty-payload contract
      -- (an empty payload decodes to one zero byte, media.py:89), so
      -- an empty text embeds as the e0 unit vector in both engines —
      -- asserted on a planted unicode+empty corpus in
      -- tests/test_multimodal.py.
      SELECT doc_id AS media_id,
             COALESCE(TRY_CAST(
                 ('0x' || substr(hex(encode(text)), 2 * i + 1, 2))
                 AS INT), 0) % 16 AS bucket
      FROM documents,
           UNNEST(range(0, GREATEST(octet_length(encode(text)), 1)))
             AS u(i)
    ),
    hist AS (
      SELECT media_id, bucket, CAST(count(*) AS DOUBLE) AS c
      FROM b GROUP BY 1, 2
    ),
    dims AS (
      SELECT doc_id AS media_id, CAST(d AS BIGINT) AS d
      FROM documents, UNNEST(range(0, 16)) AS u(d)
    ),
    h AS (
      SELECT dims.media_id, dims.d, COALESCE(hist.c, 0.0) AS c
      FROM dims LEFT JOIN hist
        ON hist.media_id = dims.media_id AND hist.bucket = dims.d
    ),
    nrm AS (SELECT media_id, sqrt(sum(c * c)) AS n FROM h GROUP BY 1)
    SELECT h.media_id, h.d AS dim_idx,
           (round(CAST(CAST(
              CASE WHEN nrm.n > 0 THEN h.c / nrm.n ELSE h.c END
            AS REAL) AS DOUBLE) + 1e-09, 7) + 0.0) AS component
    FROM h JOIN nrm ON nrm.media_id = h.media_id
    ORDER BY h.media_id, dim_idx
    """


@register(
    "media_embeddings",
    oracle=_MEDIA_EMBED_ORACLE,
    doc="Deterministic fake feature extraction: payload → L2-normalized "
    "byte-histogram vector, layout-compatible with the embeddings table. "
    "EXACTLY oracled since round 12: the histogram is integer counts and "
    "the normalization is one IEEE sqrt + one IEEE division in float64 "
    "(bit-identical across engines), rounded ONCE to float32 at the "
    "schema boundary — DuckDB reproduces byte histogram, norm, and the "
    "float32 cast (CAST AS REAL) per component.",
    tags=("multimodal",),
)
def media_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-component verification of the mapInPandas embedding path:
    (media_id, dim_idx, component) — every float of every vector
    hash-checked against the DuckDB rebuild (payload = UTF-8 text
    bytes, see module docstring), a far stronger contract than the
    old rows-only sq_norm ≈ 1 summary."""
    emb = embed_media(synth_media(spark, sf_dir), dim=16)
    from newsflow.functions.scalars import dround

    return (
        emb.select("media_id", F.posexplode("embedding"))
        .select(
            "media_id",
            F.col("pos").cast("long").alias("dim_idx"),
            dround(F.col("col").cast("double"), 7).alias("component"),
        )
        .orderBy("media_id", "dim_idx")
    )


@register(
    "media_ppm_channel_stats",
    # The pixels are closed-form ((id*7 + i*13) % 256 at flat index i),
    # so the oracle computes every decode statistic ANALYTICALLY while
    # the Spark side round-trips through real PPM bytes: header
    # emission, validating parse, raster reshape, channel sums. A
    # decoder bug (off-by-one header skip, wrong stride, channel swap)
    # breaks the hash match.
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h
      FROM documents
    ),
    px AS (
      SELECT media_id, w, h,
             (media_id * 7 + i * 13) % 256 AS v, i % 3 AS c
      FROM m, UNNEST(range(w * h * 3)) AS u(i)
    )
    SELECT media_id,
           CAST(max(w) AS INT) AS width,
           CAST(max(h) AS INT) AS height,
           CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_r,
           CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_g,
           CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_b
    FROM px GROUP BY media_id
    """,
    tags=("multimodal", "image", "executed"),
)
def media_ppm_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, exactly oracled: deterministic binary PPM
    images synthesized per document id, decoded by the pure-stdlib
    validating PPM codec (`multimodal/media.py::parse_ppm` — the image
    path is no longer a stub for container-decodable formats), per-
    channel exact pixel sums emitted. The oracle never sees the bytes:
    it recomputes the sums from the closed-form pixel function, so the
    hash comparison certifies the DECODER (header parse, raster
    stride, channel order), not just the plumbing."""
    from newsflow.multimodal.media import (
        ppm_channel_stats,
        synth_ppm_payloads,
    )

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    return ppm_channel_stats(synth_ppm_payloads(ids))


RESIZE_W, RESIZE_H = 4, 4


@register(
    "media_ppm_resize_stats",
    # Nearest-neighbor source indices are closed-form
    # (src = dst * src_dim // dst_dim), so the oracle reproduces the
    # ENTIRE decode -> resize -> re-decode chain analytically: for each
    # output pixel (x, y, c) it evaluates the synthetic pixel function
    # at the mapped source flat index. Any stride/rounding bug in the
    # real resize breaks the hash.
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h
      FROM documents
    ),
    px AS (
      SELECT media_id,
             ((i // 3) // {RESIZE_W}) AS dy,
             ((i // 3) % {RESIZE_W}) AS dx,
             i % 3 AS c, w, h
      FROM m, UNNEST(range({RESIZE_W} * {RESIZE_H} * 3)) AS u(i)
    ),
    v AS (
      SELECT media_id, c,
             (media_id * 7
              + (((dy * h // {RESIZE_H}) * w + (dx * w // {RESIZE_W}))
                 * 3 + c) * 13) % 256 AS val
      FROM px
    )
    SELECT media_id,
           CAST(sum(CASE WHEN c = 0 THEN val END) AS BIGINT) AS sum_r,
           CAST(sum(CASE WHEN c = 1 THEN val END) AS BIGINT) AS sum_g,
           CAST(sum(CASE WHEN c = 2 THEN val END) AS BIGINT) AS sum_b
    FROM v GROUP BY media_id
    """,
    tags=("multimodal", "image", "executed"),
)
def media_ppm_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize, exactly oracled: synthetic PPMs are decoded,
    nearest-neighbor-resized to {RESIZE_W}x{RESIZE_H} (numpy
    fancy-indexing on the decoded raster), re-encoded, decoded AGAIN,
    and channel-summed — two full codec round-trips plus the resample,
    all certified against an analytic oracle that evaluates the pixel
    function at the mapped source indices."""
    import pandas as pd

    from newsflow.multimodal.media import (
        parse_ppm,
        resize_ppm,
        synth_ppm_payloads,
    )

    def batches(it):
        import numpy as np

        for pdf in it:
            out = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                arr = parse_ppm(
                    resize_ppm(bytes(p), RESIZE_W, RESIZE_H)
                )
                s = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out.append((int(m), int(s[0]), int(s[1]), int(s[2])))
            yield pd.DataFrame(
                out, columns=["media_id", "sum_r", "sum_g", "sum_b"]
            )

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    return synth_ppm_payloads(ids).mapInPandas(
        batches, "media_id long, sum_r long, sum_g long, sum_b long"
    )
