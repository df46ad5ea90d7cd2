"""Multimodal column plumbing: schema, determinism, DuckDB parity, stub gate."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from dask_mwu_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mm.attach_payload(docs)


def test_media_schema(media):
    assert media.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString()
    row = media.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.payload)
    assert row.media_type in mm.MEDIA_KINDS
    assert row.media_type == mm.MEDIA_KINDS[row.doc_id % 3]


def test_decode_schema_and_determinism(media):
    out = mm.decode_media(media)
    assert out.schema == mm.DECODED_SCHEMA
    rows = {r.doc_id: r for r in out.collect()}
    again = {r.doc_id: r for r in mm.decode_media(media.repartition(7)).collect()}
    assert rows == again  # partition-layout independent
    assert len(rows) == media.count()
    # spot-check the fake decode against hand-computed md5 arithmetic
    sample = media.orderBy("doc_id").first()
    hx = hashlib.md5(bytes(sample.payload)).hexdigest()
    d = rows[sample.doc_id]
    assert d.width == 16 + int(hx[0:6], 16) % 2048
    assert d.height == 16 + int(hx[6:12], 16) % 2048
    assert d.n_channels == 1 + int(hx[12:14], 16) % 4
    assert d.checksum == int(hx[:15], 16)
    assert 16 <= d.width < 16 + 2048 and 1 <= d.n_channels <= 4


def test_decode_duckdb_parity(media, sf_dir):
    got = {
        (r.doc_id, r.width, r.height, r.n_channels, r.n_bytes, r.checksum)
        for r in mm.decode_media(media).collect()
    }
    want = set(
        duckdb.sql(
            f"""
            SELECT doc_id,
                   16 + CAST('0x' || substr(md5(text), 1, 6) AS BIGINT) % 2048,
                   16 + CAST('0x' || substr(md5(text), 7, 6) AS BIGINT) % 2048,
                   1 + CAST('0x' || substr(md5(text), 13, 2) AS BIGINT) % 4,
                   length(text),
                   CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)
            FROM '{sf_dir}/documents.parquet'
            """
        ).fetchall()
    )
    assert got == want


# real container header bytes, built per the PNG/GIF/JPEG specs
PNG_BYTES = (
    mm.PNG_SIG
    + (13).to_bytes(4, "big") + b"IHDR"
    + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
    + bytes([8, 6])  # bit depth 8, color type 6 (RGBA)
)
GIF_BYTES = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00\x00\x00"
JPEG_BYTES = (
    b"\xff\xd8"  # SOI
    + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)  # APP0
    + b"\xff\xc0" + (17).to_bytes(2, "big")  # SOF0 (baseline)
    + bytes([8]) + (480).to_bytes(2, "big") + (640).to_bytes(2, "big")
    + bytes([3]) + bytes(9)  # 3 components (YCbCr)
)


def test_real_decoder_parses_image_headers():
    png = mm.decode_real(PNG_BYTES, "image")
    assert (png["width"], png["height"], png["n_channels"]) == (640, 480, 4)
    gif = mm.decode_real(GIF_BYTES, "image")
    assert (gif["width"], gif["height"], gif["n_channels"]) == (320, 200, 3)
    jpg = mm.decode_real(JPEG_BYTES, "image")
    # SOF stores height(2) then width(2): these bytes encode a 640x480 frame
    assert (jpg["width"], jpg["height"], jpg["n_channels"]) == (640, 480, 3)
    # checksum convention matches the fake decoder's (md5-60)
    assert png["checksum"] == int(hashlib.md5(PNG_BYTES).hexdigest()[:15], 16)


def test_real_decoder_rejects_non_image_and_corrupt():
    with pytest.raises(ValueError, match="not a PNG/JPEG/GIF"):
        mm.decode_real(b"RIFF....WAVE", "audio")
    with pytest.raises(ValueError, match="IHDR"):
        mm.decode_real(mm.PNG_SIG + b"\x00\x00\x00\x0dIDAT" + bytes(10), "image")
    with pytest.raises(ValueError, match="no SOF"):
        mm.decode_real(b"\xff\xd8\xff\xda\x00\x02", "image")


def test_real_decoder_through_map_in_pandas(spark):
    """decode_media(decoder=decode_real) end-to-end: the same mapInPandas
    plumbing the fake path uses, fed real container bytes."""
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(PNG_BYTES), (len(PNG_BYTES), "image")),
            (2, "image", bytearray(GIF_BYTES), (len(GIF_BYTES), "image")),
            (3, "image", bytearray(JPEG_BYTES), (len(JPEG_BYTES), "image")),
        ],
        mm.MEDIA_SCHEMA,
    )
    got = {
        r.doc_id: (r.width, r.height, r.n_channels, r.n_bytes)
        for r in mm.decode_media(media, decoder=mm.decode_real).collect()
    }
    assert got == {
        1: (640, 480, 4, len(PNG_BYTES)),
        2: (320, 200, 3, len(GIF_BYTES)),
        3: (640, 480, 3, len(JPEG_BYTES)),
    }


def test_resize_plan(media):
    out = mm.resize_plan(media, target_w=224, target_h=224).collect()
    n_images = media.where(F.col("media_type") == "image").count()
    assert len(out) == n_images > 0
    for r in out:
        assert max(r.dst_w, r.dst_h) <= 224
        # aspect-preserving: the binding dimension hits the target box
        assert r.dst_w == 224 or r.dst_h == 224
        assert r.scale_x == round(r.dst_w / r.src_w, 6)


def test_sample_frames(media):
    frames = mm.sample_frames(media, every_k=4)
    assert frames.schema == mm.FRAME_SCHEMA
    rows = frames.collect()
    vids = {
        r.doc_id: r.meta.n_bytes
        for r in media.where(F.col("media_type") == "video").collect()
    }
    assert rows and set(r.doc_id for r in rows) <= set(vids)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for doc_id, idxs in by_doc.items():
        n_frames = vids[doc_id] // mm.FRAME_BYTES
        assert sorted(idxs) == list(range(0, n_frames, 4))


def test_extract_features_feeds_similarity(media, spark):
    feats = mm.extract_features(media, dim=8)
    assert feats.schema == mm.FEATURES_SCHEMA
    rows = feats.collect()
    assert all(len(r.features) == 8 for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r.features)
    # downstream-compatible with the similarity operators
    from dask_mwu_spark.operators import similarity as sim

    emb = feats.select(
        F.col("doc_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    topk = sim.cosine_topk(emb, n_queries=3, k=2).collect()
    assert len(topk) == 6
