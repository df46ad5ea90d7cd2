"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

No counterpart in the reference (SURVEY.md section 2.1) — this is the
Stage-4 "multimodal columns" extension: media is carried as an opaque
``binary`` payload column plus a typed metadata struct, and the per-item
codec work (decode, resize planning, frame sampling, feature extraction)
runs as Arrow-batched pandas functions over ``mapInPandas``.

Pixel/audio/video codecs (PIL/libav/soundfile) are NOT in this container.
``decode_real`` parses real image METADATA (width/height/channels from PNG
IHDR, JPEG SOFn, GIF logical-screen-descriptor header bytes) in pure
Python; pixel decode and audio/video raise ``ValueError`` until a full
codec is injected via ``decoder=``.  The default path uses a DETERMINISTIC
FAKE decoder (md5-derived pseudo dimensions/checksums) so that the
Spark-side plumbing — payload schema, Arrow batch shape, mapInPandas
signatures, partitioning — is oracle-testable on the synthetic text
payloads, which are not real image bytes.

Scale design: every operator here is per-row (zero shuffle) — mapInPandas is
a scan-stage transform, so 100 TB of media partitions trivially by input
splits; there is no key skew because there is no key. Frame sampling fans
out rows (one per sampled frame) inside the same partition, no shuffle.
Payload bytes never leave the executor except through reduced outputs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_mwu_spark.functions.hashing import MERSENNE_P

# media kinds are assigned deterministically from doc_id so the same doc
# always gets the same kind in every engine
MEDIA_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("declared_kind", T.StringType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("src_h", T.IntegerType()),
        T.StructField("dst_w", T.IntegerType()),
        T.StructField("dst_h", T.IntegerType()),
        T.StructField("scale_x", T.DoubleType()),
        T.StructField("scale_y", T.DoubleType()),
        T.StructField("resized_checksum", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)

FRAME_BYTES = 16  # fake container: fixed-size frames


def _md5_60(data: bytes) -> int:
    """60-bit integer view of md5(bytes) — matches hashing.md5_long /
    DuckDB ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``."""
    return int(hashlib.md5(data).hexdigest()[:15], 16)


def _round6(x: float) -> float:
    """Half-up round to 6 decimals for non-negative x — matches SQL ROUND
    (Python's builtin round is half-even, which would diverge from the
    DuckDB oracle on exact .5 boundaries like 1/128)."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents → media table: the text bytes become the opaque binary
    payload (stand-in for real image/audio/video bytes), with a typed
    metadata struct. Pure projection — no shuffle, no Python."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.col("doc_id") % len(MEDIA_KINDS) + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        kind.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
            kind.alias("declared_kind"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# decoders
# ---------------------------------------------------------------------------


PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → sample channels (spec §11.2.2: 0 gray, 2 RGB,
# 3 palette-indexed, 4 gray+alpha, 6 RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG SOFn markers carry frame dims; 0xC4 (DHT), 0xC8 (JPG ext), 0xCC
# (DAC) fall in the 0xC0-0xCF range but are NOT frame headers
_JPEG_NON_SOF = {0xC4, 0xC8, 0xCC}


def decode_real(payload: bytes, media_type: str) -> dict[str, Any]:
    """REAL image metadata decode in pure Python — no PIL needed.

    Container headers are just bytes: PNG stores dims in the IHDR chunk
    right after the 8-byte signature, GIF in the logical-screen descriptor
    at offset 6, JPEG in the first SOFn marker segment.  This parses all
    three, so on any cluster ``decode_media(media, decoder=decode_real)``
    extracts real width/height/channels for image payloads with zero
    dependencies.  PIXEL decode (and audio/video codecs) still needs
    PIL/libav — not in this container — so non-image payloads raise
    ``ValueError`` and a real deployment injects a full ``decoder=``
    through the same seam.
    """
    if payload[:8] == PNG_SIG:
        # signature(8) | chunk len(4 BE) | b'IHDR' | width(4 BE) |
        # height(4 BE) | bit depth(1) | color type(1)
        if len(payload) < 26 or payload[12:16] != b"IHDR":
            raise ValueError("corrupt PNG: missing IHDR chunk")
        width = int.from_bytes(payload[16:20], "big")
        height = int.from_bytes(payload[20:24], "big")
        color_type = payload[25]
        n_channels = _PNG_CHANNELS.get(color_type)
        if n_channels is None:
            raise ValueError(f"corrupt PNG: color type {color_type}")
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        # header(6) | logical screen width(2 LE) | height(2 LE)
        if len(payload) < 10:
            raise ValueError("corrupt GIF: truncated logical screen descriptor")
        width = int.from_bytes(payload[6:8], "little")
        height = int.from_bytes(payload[8:10], "little")
        n_channels = 3  # palette entries are RGB triples
    elif payload[:2] == b"\xff\xd8":
        width = height = n_channels = None
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                raise ValueError(f"corrupt JPEG: expected marker at byte {i}")
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte padding before a marker
                i += 1
                continue
            if marker == 0xDA:  # SOS: entropy-coded data, no SOF seen
                break
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
                # SOFn: len(2) | precision(1) | height(2 BE) | width(2 BE)
                # | n_components(1)
                if i + 10 > len(payload):
                    raise ValueError("corrupt JPEG: truncated SOF segment")
                height = int.from_bytes(payload[i + 5 : i + 7], "big")
                width = int.from_bytes(payload[i + 7 : i + 9], "big")
                n_channels = payload[i + 9]
                break
            i += 2 + seg_len
        if width is None:
            raise ValueError("corrupt JPEG: no SOF marker before SOS/EOF")
    else:
        raise ValueError(
            "not a PNG/JPEG/GIF payload; pixel decode and audio/video need "
            "real codecs (PIL/libav) — inject decoder= on a cluster that "
            "has them"
        )
    return {
        "width": width,
        "height": height,
        "n_channels": n_channels,
        "checksum": _md5_60(payload),
    }


def fake_decode(payload: bytes, media_type: str) -> dict[str, Any]:
    """Deterministic fake decode: pseudo dimensions derived from the payload
    md5 — stable across engines/partitionings, so tests and the DuckDB
    oracle can check the full pipeline bit-for-bit."""
    hx = hashlib.md5(payload).hexdigest()
    return {
        "width": 16 + int(hx[0:6], 16) % 2048,
        "height": 16 + int(hx[6:12], 16) % 2048,
        "n_channels": 1 + int(hx[12:14], 16) % 4,
        "checksum": int(hx[:15], 16),
    }


def decode_media(
    media: DataFrame,
    *,
    decoder: Callable[[bytes, str], dict[str, Any]] = fake_decode,
) -> DataFrame:
    """Decode payloads to typed metadata via Arrow-batched mapInPandas.

    One Python task per input partition; each Arrow batch is a pandas
    DataFrame with the full MEDIA_SCHEMA columns. Output is one row per
    input row (schema DECODED_SCHEMA).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decoder(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "width": pd.Series([d["width"] for d in decoded], dtype="int32"),
                    "height": pd.Series([d["height"] for d in decoded], dtype="int32"),
                    "n_channels": pd.Series(
                        [d["n_channels"] for d in decoded], dtype="int32"
                    ),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "checksum": pd.Series(
                        [d["checksum"] for d in decoded], dtype="int64"
                    ),
                }
            )

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


def resize_plan(
    media: DataFrame, *, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Aspect-preserving resize plan for image payloads: compute target dims
    (fit-within box, min scale factor) + a deterministic checksum of the
    "resized" result (md5 of payload bytes || 'x{dst_w}x{dst_h}').

    The arithmetic is the real thing a resize UDF does before touching
    pixels; the pixel pass itself is the stubbed codec step.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = fake_decode(payload, "image")
                sw, sh = d["width"], d["height"]
                scale = min(target_w / sw, target_h / sh)
                # round-half-up so the binding dimension lands exactly on the
                # target despite float division (int() would give 223 for 224)
                dw = max(1, int(sw * scale + 0.5))
                dh = max(1, int(sh * scale + 0.5))
                rows.append(
                    (
                        doc_id,
                        sw,
                        sh,
                        dw,
                        dh,
                        _round6(dw / sw),
                        _round6(dh / sh),
                        _md5_60(payload + f"x{dw}x{dh}".encode()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in RESIZE_SCHEMA.fields],
            ).astype(
                {
                    "doc_id": "int64",
                    "src_w": "int32",
                    "src_h": "int32",
                    "dst_w": "int32",
                    "dst_h": "int32",
                    "resized_checksum": "int64",
                }
            )

    return (
        media.where(F.col("media_type") == "image")
        .mapInPandas(_resize, schema=RESIZE_SCHEMA)
    )


def sample_frames(media: DataFrame, *, every_k: int = 4) -> DataFrame:
    """Frame sampling for video payloads: the fake container is a sequence
    of FRAME_BYTES-byte frames; emit every k-th frame's index + checksum.

    Fan-out happens inside the partition (no shuffle); output rows ≈
    n_bytes/(FRAME_BYTES·k) per video — bounded, uniform.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc: list[int] = []
            out_idx: list[int] = []
            out_ck: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // FRAME_BYTES
                for idx in range(0, n_frames, every_k):
                    frame = payload[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                    out_doc.append(doc_id)
                    out_idx.append(idx)
                    out_ck.append(_md5_60(frame) % MERSENNE_P)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int64"),
                    "frame_checksum": pd.Series(out_ck, dtype="int64"),
                }
            )

    return (
        media.where(F.col("media_type") == "video")
        .mapInPandas(_frames, schema=FRAME_SCHEMA)
    )


FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(media: DataFrame, *, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction stub: a deterministic ``dim``-dim pseudo-embedding
    in [0,1) per payload (md5(payload || '#j') mod p / p). The real model
    forward pass is the swappable codec step; the Arrow batch shape, output
    array column, and downstream compatibility with the similarity operators
    (sim.cosine_topk takes any (id, array<double>) table) are real.
    """

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [
                    _round6((_md5_60(p + f"#{j}".encode()) % MERSENNE_P) / MERSENNE_P)
                    for j in range(dim)
                ]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return media.mapInPandas(_feats, schema=FEATURES_SCHEMA)
