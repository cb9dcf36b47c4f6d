"""Tests for the multimodal binary-column plumbing: real Spark schemas,
Arrow batch shapes, multi-row emission — with the deterministic stub
codec (no codec libraries in this container)."""

from __future__ import annotations

import pytest

from newsflow.multimodal.media import (
    MEDIA_SCHEMA,
    decode_media,
    decode_stats,
    embed_media,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"abcd", (64, 48, 3, 0, 0, "x-fake/image")),
        (2, "audio", b"\x00\x01\x02\x03\x04\x05", (0, 0, 1, 16000, 0, "x-fake/audio")),
        (3, "video", b"0123456789abcdefghij", (64, 48, 3, 0, 25, "x-fake/video")),
        (4, "video", b"xy", (64, 48, 3, 0, 5, "x-fake/video")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).cache()


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"payload", "image")


def test_decode_stats_batch_path(media):
    out = {r["media_id"]: r for r in decode_stats(media).collect()}
    assert len(out) == 4
    assert out[1]["n_bytes"] == 4
    # mean of b"abcd" = (97+98+99+100)*100 // 4 = 9850
    assert out[1]["mean_byte"] == 9850
    assert out[2]["mean_byte"] == (0 + 1 + 2 + 3 + 4 + 5) * 100 // 6
    assert out[3]["n_frames"] == 25


def test_frame_sample_multi_row_emission(media):
    rows = frame_sample(media, every_n=10).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    # Only video rows survive; 25 frames @ every 10 → frames 0,10,20.
    assert set(by_id) == {3, 4}
    assert sorted(r["frame_no"] for r in by_id[3]) == [0, 10, 20]
    assert [r["frame_no"] for r in by_id[4]] == [0]
    # 20 bytes / 25 frames → floor 0 → clamped to 1.
    assert by_id[3][0]["frame_bytes"] == 1


def test_embed_media_deterministic_unit_norm(media):
    e1 = {r["media_id"]: r["embedding"] for r in embed_media(media, dim=8).collect()}
    e2 = {r["media_id"]: r["embedding"] for r in embed_media(media, dim=8).collect()}
    assert e1 == e2  # byte-derived, partition-independent
    assert all(len(v) == 8 for v in e1.values())
    for v in e1.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5


def test_resize_images_rewrites_payload_and_meta(media):
    from newsflow.multimodal.media import resize_images

    out = {r["media_id"]: r for r in resize_images(media, 4, 2).collect()}
    img = out[1]  # image row: b"abcd", meta channels=3
    assert len(img["payload"]) == 4 * 2 * 3
    assert (img["meta"]["width"], img["meta"]["height"]) == (4, 2)
    # Deterministic resample of the source bytes.
    assert bytes(img["payload"])[0:1] == b"a" and bytes(img["payload"])[-1:] == b"d"
    # Non-image rows pass through untouched.
    aud = out[2]
    assert bytes(aud["payload"]) == b"\x00\x01\x02\x03\x04\x05"
    assert aud["meta"]["sample_rate"] == 16000


def test_ppm_codec_roundtrip_and_validation():
    import numpy as np
    import pytest

    from newsflow.multimodal.media import encode_ppm, parse_ppm

    a = (np.arange(6 * 4 * 3, dtype=np.int64) * 7 % 256).astype(
        np.uint8
    ).reshape(6, 4, 3)
    assert (parse_ppm(encode_ppm(a)) == a).all()
    # comments in the header are legal PPM
    with_comment = b"P6\n# synthetic\n4 6\n255\n" + a.tobytes()
    assert (parse_ppm(with_comment) == a).all()
    with pytest.raises(ValueError):
        parse_ppm(b"P5\n1 1\n255\n\x00")  # wrong magic (PGM)
    with pytest.raises(ValueError):
        parse_ppm(b"P6\n4 4\n255\n\x00\x00")  # short raster
    with pytest.raises(ValueError):
        parse_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 12)  # 16-bit maxval


def test_decode_media_really_decodes_ppm():
    import numpy as np

    from newsflow.multimodal.media import decode_media, encode_ppm

    a = np.zeros((2, 3, 3), dtype=np.uint8)
    a[1, 2, 0] = 200
    out = decode_media(encode_ppm(a), "image")
    assert out.shape == (2, 3, 3) and out[1, 2, 0] == 200


def test_resize_ppm_nearest_neighbor():
    import numpy as np

    from newsflow.multimodal.media import encode_ppm, parse_ppm, resize_ppm

    a = np.arange(6 * 8 * 3, dtype=np.int64).astype(np.uint8).reshape(6, 8, 3)
    out = parse_ppm(resize_ppm(encode_ppm(a), 4, 3))
    assert out.shape == (3, 4, 3)
    # spot-check the NN mapping: dst (y, x) <- src (y*6//3, x*8//4)
    for y in range(3):
        for x in range(4):
            assert (out[y, x] == a[y * 6 // 3, x * 8 // 4]).all()


def test_media_embed_oracle_is_byte_based_on_unicode_and_empty(spark):
    """ADVICE r12: the media_embeddings oracle must histogram UTF-8
    BYTES like the Spark side (np.frombuffer of text.encode()), not
    codepoints — and an empty text must yield the all-zero vector in
    both engines, not a phantom bucket. Plant a corpus the old
    codepoint oracle provably got wrong (multibyte unicode + empty
    text embeds as decode_media's one-zero-byte contract — the e0
    unit vector — in both engines) and assert Spark == oracle
    value-for-value."""
    import duckdb

    from newsflow.multimodal.queries import _MEDIA_EMBED_ORACLE, register
    from newsflow.multimodal.media import embed_media
    from newsflow.multimodal.queries import synth_media  # noqa: F401

    docs = spark.createDataFrame(
        [
            (0, "héllo ✓ wörld"),  # multibyte: codepoints != bytes
            (1, ""),  # empty: decodes as one zero byte -> e0 vector
            (2, "plain ascii"),
        ],
        "doc_id long, text string",
    )
    import pyspark.sql.functions as F2

    from newsflow.functions.scalars import dround

    media = docs.select(
        docs.doc_id.alias("media_id"),
        F2.encode("text", "UTF-8").alias("payload"),
    )

    got = {
        (r.media_id, r.dim_idx): r.component
        for r in embed_media(media.withColumn("kind", F2.lit("image"))
                             .withColumn("meta", F2.lit(None)), dim=16)
        .select("media_id", F2.posexplode("embedding"))
        .select(
            "media_id",
            F2.col("pos").cast("long").alias("dim_idx"),
            dround(F2.col("col").cast("double"), 7).alias("component"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {
        (r[0], r[1]): r[2]
        for r in con.sql(_MEDIA_EMBED_ORACLE).fetchall()
    }
    assert got == want
    # The empty doc embeds as the e0 unit vector in both engines
    # (decode_media's one-zero-byte contract for empty payloads).
    assert want[(1, 0)] == 1.0
    assert all(want[(1, d)] == 0.0 for d in range(1, 16))
