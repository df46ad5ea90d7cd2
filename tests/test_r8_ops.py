"""Round-8 regression tests.

Covers the VERDICT r7 items: bench stdout truncation-proofing (#2), the
stdlib AVI video codec (#4), and learned BPE merges (#5).
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _simulate_driver_capture(stdout: str, window: int = 2000) -> dict:
    """Replicate the driver's recording: keep the LAST `window` characters
    of stdout (BENCH_r07.json's `tail` field is exactly this), then parse
    the trailing JSON line out of it."""
    tail = stdout[-window:]
    for line in reversed(tail.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError("no parseable JSON line survived the tail capture")


def test_bench_line_survives_tail_truncation():
    # worst-case median widths: every benched query at a 4-digit-second
    # median with 3 decimals (e.g. 1234.567) — wider than anything real
    timings = {name: 1234.567 for name in bench.BENCH_QUERIES}
    line, detail = bench.format_bench_output(timings, "0.1", 3)
    assert len(line) <= bench.TAIL_CAPTURE_BUDGET
    # simulate: 5k of progress-bar noise before the line, newline after
    stdout = ("\r[Stage 42:>  (0 + 32) / 32]" * 200) + "\n" + line + "\n"
    parsed = _simulate_driver_capture(stdout)
    assert set(parsed["queries"]) == set(bench.BENCH_QUERIES)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["value"] == round(sum(timings.values()), 3)
    # the sidecar keeps what was moved off stdout
    samples = {name: [1.0, 2.0, 3.0] for name in bench.BENCH_QUERIES}
    _, detail = bench.format_bench_output(timings, "0.1", 3, samples)
    assert set(detail["spread"]) == set(bench.BENCH_QUERIES)


def test_bench_line_budget_guard_fires():
    # a registry grown past the capture window must fail LOUDLY at format
    # time, not silently truncate in the recorded artifact
    timings = {f"query_with_a_rather_long_name_{i:03d}": 1.234 for i in range(80)}
    with pytest.raises(AssertionError, match="tail capture"):
        bench.format_bench_output(timings, "0.1", 3)


# ---------------------------------------------------------------------------
# Learned BPE merges (VERDICT r7 item 5)
# ---------------------------------------------------------------------------


def test_bpe_merges_paper_worked_example(spark):
    """Sennrich, Haddow & Birch (ACL 2016) Algorithm 1 worked example:
    vocab {low:5, lower:2, newest:6, widest:3} learns es, est, est</w>,
    lo, low — reproduced exactly under the pinned tiebreak."""
    from dask_mwu_spark.operators.text import bpe_train_merges

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["doc_id", "text"]
    )
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train_merges(docs, n_merges=5).collect()
    ]
    assert got == [
        (0, "e", "s", 9),
        (1, "es", "t", 9),
        (2, "est", "</w>", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
    ]


def test_bpe_merge_is_greedy_left_to_right_non_overlapping(spark):
    """Pair stats count overlaps (aaaa -> 3x (a,a)) but the merge is a
    single left-to-right pass: aaaa becomes (aa)(aa), never (aa)(a)(a) —
    observable in round 1's candidate set containing (aa,aa)=3."""
    from dask_mwu_spark.operators.text import bpe_train_merges

    docs = spark.createDataFrame([(0, "aaaa aaaa aaaa")], ["doc_id", "text"])
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train_merges(docs, n_merges=2).collect()
    ]
    # round 0: (a,a) at 3 overlapping positions x freq 3 = 9
    # round 1: syms are (aa)(aa)(</w>) -> candidates (aa,aa)=3 and
    # (aa,</w>)=3 tie on count and lhs; rhs '<' (0x3c) sorts before 'a'.
    # A non-greedy/overlapping merge would have left (a) symbols and a
    # different candidate set entirely.
    assert got[0] == (0, "a", "a", 9)
    assert got[1] == (1, "aa", "</w>", 3)


def test_bpe_merges_drops_empty_tokens_and_validates(spark):
    from dask_mwu_spark.operators.text import bpe_train_merges

    # doubled spaces produce empty split tokens; they must not surface as
    # a phantom ('', '</w>') symbol pair
    docs = spark.createDataFrame([(0, "ab  ab  ab")], ["doc_id", "text"])
    got = bpe_train_merges(docs, n_merges=1).collect()
    assert (got[0].lhs, got[0].rhs, got[0].pair_count) == ("a", "b", 3)
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train_merges(docs, n_merges=0)


def test_bpe_max_vocab_caps_training_table(spark):
    """max_vocab keeps only the top words by (freq desc, word asc).
    Corpus {xy:3, ab:2, cab:2}: untrained winner is (a,b)=4 (shared by
    two low-freq words); capped to the single most frequent word the
    trainer sees only 'xy' and learns (x,y)=3."""
    from dask_mwu_spark.operators.text import bpe_train_merges

    docs = spark.createDataFrame(
        [(0, "xy xy xy ab ab cab cab")], ["doc_id", "text"]
    )
    full = bpe_train_merges(docs, n_merges=1).collect()
    assert (full[0].lhs, full[0].rhs, full[0].pair_count) == ("a", "b", 4)
    capped = bpe_train_merges(docs, n_merges=1, max_vocab=1).collect()
    assert (capped[0].lhs, capped[0].rhs, capped[0].pair_count) == ("x", "y", 3)


def test_leak_gate_ignores_checkpoints_counts_untracked_persists(spark):
    """Round-8 gate contract: the leak gates assert zero NON-checkpoint
    persistent RDDs (the tracked_persist registry contract).  A
    localCheckpoint intermediate must NOT count (it lingers on JVM GC
    timing — traced 18-30s holds that made count-based gates flaky),
    while a genuinely untracked persist MUST."""
    from dask_mwu_spark.cache import gc_reclaim, jvm_leaked_count
    from dask_mwu_spark.operators.text import bpe_train_merges

    baseline = jvm_leaked_count(spark)
    docs = spark.createDataFrame(
        [(i, "low lower newest widest") for i in range(10)],
        ["doc_id", "text"],
    )
    res = bpe_train_merges(docs, n_merges=3).toPandas()
    assert len(res) == 3
    del res
    # checkpoint RDDs from the trainer may still be draining; the gate
    # quantity is unaffected by them
    assert jvm_leaked_count(spark) == baseline
    # an untracked persist IS counted...
    leak = spark.range(100).persist()
    leak.count()
    assert jvm_leaked_count(spark) == baseline + 1
    # ...until released
    leak.unpersist()
    assert jvm_leaked_count(spark) == baseline
    # and gc_reclaim still drives the checkpoint drain (bounded wait,
    # no exact-count assertion — that timing is the flake we removed)
    gc_reclaim(spark, timeout_s=2.0)


# ---------------------------------------------------------------------------
# Stdlib RIFF/AVI codec (VERDICT r7 item 4)
# ---------------------------------------------------------------------------


def test_avi_round_trip_with_stride_and_flip():
    from dask_mwu_spark.operators.multimodal import decode_avi, encode_avi

    frames = [bytes((i * 7 + j) % 256 for j in range(8 * 8)) for i in range(4)]
    avi = encode_avi(frames, 8, 8)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert decode_avi(avi) == (8, 8, 1, b"".join(frames))
    # every_k sampling picks frames 0 and 2
    assert decode_avi(avi, every_k=2) == (8, 8, 1, frames[0] + frames[2])
    # odd width exercises the 4-byte stride padding AND the bottom-up
    # flip (w=5 -> stride 8; a parser that ignores either corrupts rows)
    fr5 = [bytes(range(5 * 3))]
    assert decode_avi(encode_avi(fr5, 5, 3)) == (5, 3, 1, fr5[0])


def test_avi_corrupt_inputs_raise_specifically():
    from dask_mwu_spark.operators.multimodal import decode_avi, encode_avi

    avi = encode_avi([bytes(64)], 8, 8)
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_avi(b"JUNK" + avi[4:])
    with pytest.raises(ValueError, match="truncated RIFF header"):
        decode_avi(avi[:11])
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(avi[:8] + b"WAVE" + avi[12:])
    with pytest.raises(ValueError, match="overruns"):
        decode_avi(avi[:200])
    # flip biCompression to 1 (BI_RLE8): must name the codec, not crash
    off = avi.find(b"strf") + 8 + 16
    rle = avi[:off] + (1).to_bytes(4, "little") + avi[off + 4 :]
    with pytest.raises(ValueError, match="biCompression=1"):
        decode_avi(rle)
    # truncate a movi frame chunk's declared size past its parent
    with pytest.raises(ValueError, match="frame|overruns|truncated"):
        pos = avi.find(b"00db")
        decode_avi(avi[: pos + 8 + 10])
    # encoder input validation
    with pytest.raises(ValueError, match="expected 64 bytes"):
        encode_avi([bytes(63)], 8, 8)


def test_avi_24bit_bgr_decode():
    """decode_avi handles the other uncompressed layout: 24-bit BGR,
    bottom-up, stride-padded (w=3 -> 9 row bytes pad to 12)."""
    from dask_mwu_spark.operators.multimodal import (
        _avi_chunk,
        _avi_list,
        decode_avi,
    )
    import struct

    w, h = 3, 2
    row0, row1 = bytes(range(9)), bytes(range(9, 18))  # top-down truth
    stride = 12
    dib = (row1 + b"\x00" * 3) + (row0 + b"\x00" * 3)  # bottom-up, padded
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sI2H8I4h", b"vids", b"DIB ", 0, 0, 0, 0, 1, 10, 0, 1,
        stride * h, 0, 0, 0, 0, w, h,
    )
    avih = struct.pack("<14I", 100000, 0, 0, 0x10, 1, 0, 1, stride * h, w, h, 0, 0, 0, 0)
    hdrl = _avi_list(
        b"hdrl",
        _avi_chunk(b"avih", avih)
        + _avi_list(b"strl", _avi_chunk(b"strh", strh) + _avi_chunk(b"strf", strf)),
    )
    avi = _avi_chunk(
        b"RIFF", b"AVI " + hdrl + _avi_list(b"movi", _avi_chunk(b"00db", dib))
    )
    assert decode_avi(avi) == (w, h, 3, row0 + row1)


def test_real_decode_stats_avi_matches_mjpng_and_falls_back(spark):
    """The same documents produce IDENTICAL decode stats through the AVI
    and MJPNG video containers (round-trip identity both ways), and an
    injected decoder that throws falls back to the stdlib AVI parser for
    RIFF payloads (mixed-container contract, extended from r7's MJPNG
    fallback)."""
    from dask_mwu_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(i, f"doc {i} " + "x" * 300) for i in range(9)], ["doc_id", "text"]
    )
    base = (
        mm.real_decode_stats(mm.attach_real_payload(docs), every_k=2)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    avi = (
        mm.real_decode_stats(
            mm.attach_real_payload(docs, video_format="avi"), every_k=2
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd_testing = pytest.importorskip("pandas.testing")
    pd_testing.assert_frame_equal(base, avi)

    def exploding_decoder(payload: bytes):
        raise RuntimeError("codec binary not on this node")

    fb = (
        mm.real_decode_stats(
            mm.attach_real_payload(docs, video_format="avi"),
            every_k=2,
            video_decoder=exploding_decoder,
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd_testing.assert_frame_equal(base, fb)


def test_attach_real_payload_rejects_unknown_video_format(spark):
    from dask_mwu_spark.operators import multimodal as mm

    docs = spark.createDataFrame([(0, "t")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="video_format"):
        mm.attach_real_payload(docs, video_format="webm")


def test_avi_multistream_takes_video_strf_not_audio():
    """An audio strl ahead of the video strl must not have its
    WAVEFORMATEX parsed as a BITMAPINFOHEADER (the strf is gated on the
    owning strh's fccType)."""
    from dask_mwu_spark.operators.multimodal import (
        _avi_chunk,
        _avi_list,
        decode_avi,
        encode_avi,
    )
    import struct

    # rebuild: RIFF(AVI  hdrl[avih, strl_audio, strl_video] movi ...):
    # splice a minimal audio strl BEFORE the video strl of a real file
    frames = [bytes((j * 3) % 256 for j in range(64))]
    good = encode_avi(frames, 8, 8)
    auds_strh = struct.pack(
        "<4s4sI2H8I4h", b"auds", b"\x01\x00\x00\x00", 0, 0, 0, 0,
        1, 8000, 0, 100, 0, 0, 1, 0, 0, 0, 0,
    )
    # WAVEFORMATEX padded to 40+ bytes so a naive parser WOULD unpack it
    auds_strf = struct.pack("<2H2I2H", 1, 1, 8000, 8000, 1, 8) + bytes(32)
    audio_strl = _avi_list(
        b"strl", _avi_chunk(b"strh", auds_strh) + _avi_chunk(b"strf", auds_strf)
    )
    hdrl_pos = good.find(b"hdrl")
    avih_end = good.find(b"LIST", hdrl_pos)  # start of video strl LIST
    avih_chunk = good[hdrl_pos + 4 : avih_end]
    video_strl = good[avih_end : good.find(b"LIST", avih_end + 4)]
    movi_on = good[good.find(b"LIST", avih_end + 4) :]
    # with audio spliced in as stream 0, the video stream becomes stream
    # 1 — a real muxer numbers movi chunk ids by strl order, so the
    # video frames must be '01db' for the file to stay spec-consistent
    movi_on = movi_on.replace(b"00db", b"01db")
    hdrl = _avi_list(b"hdrl", avih_chunk + audio_strl + video_strl)
    spliced = _avi_chunk(b"RIFF", b"AVI " + hdrl + movi_on)
    assert decode_avi(spliced) == (8, 8, 1, frames[0])


def test_avi_interleaved_rec_lists_and_stream_filter():
    """Spec-valid layouts the first parser rejected (review r8): frames
    grouped inside 'LIST rec ' (classic interleaved AVI) decode, and a
    second stream's '01db' chunks are excluded rather than interleaved
    into the video sequence."""
    from dask_mwu_spark.operators.multimodal import (
        _avi_chunk,
        _avi_list,
        decode_avi,
        encode_avi,
    )

    frames = [bytes((i * 11 + j) % 256 for j in range(64)) for i in range(2)]
    good = encode_avi(frames, 8, 8)
    # keep the real file's hdrl; rebuild the movi with rec groupings
    movi_pos = good.find(b"movi")
    hdrl_start = good.find(b"LIST")
    movi_list_start = good.rfind(b"LIST", 0, movi_pos)
    hdrl_blob = good[hdrl_start:movi_list_start]

    def dib(fr: bytes) -> bytes:  # 8x8 8-bit rows are stride-exact
        return b"".join(fr[r * 8 : (r + 1) * 8] for r in reversed(range(8)))

    rec_movi = _avi_list(
        b"movi",
        _avi_list(b"rec ", _avi_chunk(b"00db", dib(frames[0]))
                  + _avi_chunk(b"01db", bytes(64)))       # foreign stream
        + _avi_list(b"rec ", _avi_chunk(b"00db", dib(frames[1]))),
    )
    rebuilt = _avi_chunk(b"RIFF", b"AVI " + hdrl_blob + rec_movi)
    assert decode_avi(rebuilt) == (8, 8, 1, frames[0] + frames[1])


def test_bpe_segment_words_matches_paper_segmentations(spark):
    """The apply twin: after the paper's 5 merges (es, est, est</w>, lo,
    low), the four vocabulary words segment exactly as Sennrich et al.'s
    example implies — including 'lower' reusing the (lo, w) merge learned
    from 'low'."""
    from dask_mwu_spark.operators.text import bpe_segment_words

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["doc_id", "text"]
    )
    rows = bpe_segment_words(docs, n_merges=5).collect()
    segs: dict[str, list[str]] = {}
    freqs: dict[str, int] = {}
    for r in sorted(rows, key=lambda r: (r.word, r.pos)):
        segs.setdefault(r.word, []).append(r.subword)
        freqs[r.word] = r.freq
    assert segs == {
        "low": ["low", "</w>"],
        "lower": ["low", "e", "r", "</w>"],
        "newest": ["n", "e", "w", "est</w>"],
        "widest": ["w", "i", "d", "est</w>"],
    }
    assert freqs == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_bpe_pair_exhaustion_stops_instead_of_annihilating(spark):
    """Review r8: when merge pairs run out before n_merges rounds, the
    trainer must STOP (merge table simply shorter), not crossJoin the
    vocabulary against an empty winner and lose every segmentation."""
    from dask_mwu_spark.operators.text import (
        bpe_segment_words,
        bpe_train_merges,
    )

    # 'a' -> [a, </w>]: exactly ONE pair exists, then nothing to merge
    docs = spark.createDataFrame([(0, "a a a")], ["doc_id", "text"])
    merges = bpe_train_merges(docs, n_merges=4).collect()
    assert [(m.merge_rank, m.lhs, m.rhs, m.pair_count) for m in merges] == [
        (0, "a", "</w>", 3)
    ]
    segs = bpe_segment_words(docs, n_merges=4).collect()
    assert [(r.word, r.pos, r.subword, r.freq) for r in segs] == [
        ("a", 0, "a</w>", 3)
    ]
