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


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_real(b"\x89PNG", "image")


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
