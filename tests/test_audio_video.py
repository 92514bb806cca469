"""RIFF/WAV + motion-JPEG tests: strictness and lossless round-trips the
gate relies on, plus behaviors the gate can't see (8-bit WAV, stereo,
length-prefix frame skipping)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from obadiah_spark.pipelines.audio import encode_wav, wav_decode, wav_header  # noqa: E402
from obadiah_spark.pipelines.jpeg import encode_jpeg, jpeg_decode  # noqa: E402
from obadiah_spark.pipelines.video import mjpeg_pack, mjpeg_unpack  # noqa: E402


def test_wav_16bit_roundtrip_exact():
    s = np.arange(-32768, 32768, 257, dtype=np.int32)
    dec = wav_decode(encode_wav(s, 44100))
    assert dec is not None
    assert dec["sample_rate"] == 44100 and dec["bits"] == 16
    assert (dec["samples"][:, 0] == s).all()


def test_wav_8bit_and_stereo():
    d8 = wav_decode(encode_wav(np.array([-128, 0, 127]), 8000, bits=8))
    assert d8 is not None and d8["bits"] == 8
    assert (d8["samples"][:, 0] == [-128, 0, 127]).all()
    st = np.array([[1, -1], [300, -300], [0, 7]])
    ds = wav_decode(encode_wav(st, 16000))
    assert ds is not None and ds["channels"] == 2
    assert (ds["samples"] == st).all()


def test_wav_strictness():
    wav = encode_wav(np.arange(10), 8000)
    assert wav_decode(wav[:-3]) is None          # RIFF size mismatch
    assert wav_decode(wav + b"x") is None        # trailing garbage
    assert wav_decode(b"RIFF\x04\x00\x00\x00WAVE") is None  # no fmt/data
    assert wav_header(b"not audio") is None
    # inconsistent byte rate must be rejected
    bad = bytearray(wav)
    bad[28] ^= 0xFF  # byte_rate field
    assert wav_decode(bytes(bad)) is None


def test_mjpeg_pack_walk_and_selective_decode():
    vals = (30, 90, 150, 210)
    frames = [encode_jpeg(8, 8, bytes([v] * 64), channels=1) for v in vals]
    blob = mjpeg_pack(frames)
    # full walk
    allf = mjpeg_unpack(blob)
    assert [f for f, _ in allf] == [0, 1, 2, 3]
    # selective walk returns exactly the sampled frames, decodable
    got = mjpeg_unpack(blob, only={0, 2})
    assert [f for f, _ in got] == [0, 2]
    for fno, fr in got:
        img = jpeg_decode(fr)
        assert img["pixels"] == bytes([vals[fno]] * 64)


def test_mjpeg_sample_fanout_cardinality(spark):
    """The contract absorbed from the retired frame_sample gate (r10):
    rows per doc = ceil(min(len(text), MAX_FRAMES) / every) — output
    cardinality is data-dependent, and sampled indices are 0, 2, ..."""
    import math

    from obadiah_spark.pipelines.video import (
        MJPEG_EVERY, MJPEG_MAX_FRAMES, mjpeg_sample)

    docs = spark.createDataFrame(
        [(0, "abcdefghij"), (1, "abc"), (2, "x"), (3, "")],
        "doc_id bigint, text string")
    out = mjpeg_sample(docs).toPandas()

    def expect(n):
        return math.ceil(min(n, MJPEG_MAX_FRAMES) / MJPEG_EVERY)

    counts = out.groupby("doc_id").size().to_dict()
    assert counts == {0: expect(10), 1: expect(3), 2: expect(1)}  # 3: empty
    assert set(out[out.doc_id == 0].frame_no) == {0, 2, 4, 6}


def test_wav_pos_weighted_pins_sample_order(spark):
    """ADVICE r9: on the ASCII gate fabric every sample is negative, so
    zero_crossings is identically 0 — pos_weighted is the order pin:
    same byte multiset, different order => different value."""
    from obadiah_spark.pipelines.audio import wav_roundtrip

    docs = spark.createDataFrame([(0, "ab"), (1, "ba")],
                                 "doc_id bigint, text string")
    out = wav_roundtrip(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "sum_sq"] == out.loc[1, "sum_sq"]
    assert (out.zero_crossings == 0).all()
    a, b = ord("a") - 128, ord("b") - 128
    assert out.loc[0, "pos_weighted"] == 1 * a + 2 * b
    assert out.loc[1, "pos_weighted"] == 1 * b + 2 * a
    assert out.loc[0, "pos_weighted"] != out.loc[1, "pos_weighted"]


def test_mjpeg_strictness():
    frames = [encode_jpeg(8, 8, bytes([7] * 64), channels=1)]
    blob = mjpeg_pack(frames)
    assert mjpeg_unpack(blob + b"z") is None     # trailing garbage
    assert mjpeg_unpack(blob[:-2]) is None       # truncated frame
    assert mjpeg_unpack(b"MJPG\x02\x00\x00\x00") is None  # missing frames
    assert mjpeg_unpack(b"AVI \x00\x00\x00\x00") is None  # wrong magic
