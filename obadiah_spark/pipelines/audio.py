"""Pure-Python RIFF/WAV PCM codec + audio feature extraction — the audio
leg of the multimodal family (images: :mod:`.multimodal` / :mod:`.jpeg`;
video: :mod:`.video`).

``wav_decode`` is a strict RIFF walk (RIFF size must equal the payload,
one ``fmt `` chunk declaring integer PCM with consistent block align /
byte rate, one ``data`` chunk whose size matches the sample layout) —
arbitrary bytes never "accidentally" parse. Features are integer
arithmetic (sample count, sum of squares, peak absolute value) so the
gate's DuckDB oracle reproduces them exactly; no libm in the checked path.

Scale posture: decode + features are per-payload work inside one
mapInPandas pass — no shuffle, parallelism = input splits.
"""

from __future__ import annotations

from collections.abc import Iterator

import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------- G.711 mu-law ------
# ITU-T G.711 / Sun g711.c companding: 8-bit codes <-> 14-bit linear
# samples in the 16-bit domain. Decode is a 256-entry table; encode is
# sign + segment search on the biased magnitude + 4-bit mantissa, all
# bit-exact to the CCITT reference.
_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635
# the 8-segment grid is shared by both G.711 laws
_G711_SEG_END = np.array(
    [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF],
    dtype=np.int64)


def _build_ulaw_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int32)
    for code in range(256):
        u = ~code & 0xFF
        t = (((u & 0x0F) << 3) + _ULAW_BIAS) << ((u & 0x70) >> 4)
        out[code] = (_ULAW_BIAS - t) if (u & 0x80) else (t - _ULAW_BIAS)
    return out


_ULAW_DECODE = _build_ulaw_table()


def mulaw_decode(codes: bytes | np.ndarray) -> np.ndarray:
    """8-bit mu-law codes -> int32 linear samples (±32124 max)."""
    arr = np.frombuffer(codes, dtype=np.uint8) if isinstance(
        codes, (bytes, bytearray)) else np.asarray(codes, dtype=np.uint8)
    return _ULAW_DECODE[arr]


def mulaw_encode(samples: np.ndarray) -> bytes:
    """int linear samples -> 8-bit mu-law codes (vectorized Sun
    linear2ulaw: clip, bias, segment search, mantissa, invert).

    Variant note: this matches Sun's g711.c, which biases ``|x|``
    directly for negative inputs.  CPython's (removed) audioop instead
    rounds negative magnitudes via an arithmetic ``>> 2`` BEFORE
    negation, which differs on 381 boundary samples — so "bit-exact to
    the CCITT reference" means the Sun-code variant; a future interop
    test against audioop/ffmpeg output seeing those samples differ is
    the known variant split, not a regression."""
    x = np.asarray(samples, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    seg = np.searchsorted(_G711_SEG_END, mag, side="left")
    mant = (mag >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant) & 0xFF).astype(np.uint8).tobytes()


# G.711 A-law (the European companding sibling; fmt tag 6). Unlike
# mu-law there is no bias and no double zero code — encode(decode(c))
# == c for ALL 256 codes (pytest-pinned). Decoded magnitudes occupy the
# 13-bit grid scaled to the 16-bit domain (±32256 max).
_ALAW_XOR = 0x55


def _build_alaw_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int32)
    for code in range(256):
        a = code ^ _ALAW_XOR
        seg = (a & 0x70) >> 4
        mant = a & 0x0F
        if seg == 0:
            t = (mant << 4) + 8
        else:
            t = ((mant << 4) + 0x108) << (seg - 1)
        out[code] = -t if (a & 0x80) == 0 else t
    return out


_ALAW_DECODE = _build_alaw_table()


def alaw_decode(codes: bytes | np.ndarray) -> np.ndarray:
    """8-bit A-law codes -> int32 linear samples (±32256 max)."""
    arr = np.frombuffer(codes, dtype=np.uint8) if isinstance(
        codes, (bytes, bytearray)) else np.asarray(codes, dtype=np.uint8)
    return _ALAW_DECODE[arr]


def alaw_encode(samples: np.ndarray) -> bytes:
    """int linear samples -> 8-bit A-law codes (vectorized Sun
    linear2alaw: sign, segment search on the unbiased magnitude,
    mantissa, 0x55 toggle)."""
    x = np.asarray(samples, dtype=np.int64)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.where(x >= 0, x, -x - 1), 0x7FFF)
    seg = np.searchsorted(_G711_SEG_END, mag, side="left")
    mant = np.where(seg < 2, (mag >> 4) & 0x0F,
                    (mag >> (seg + 3)) & 0x0F)
    return (((sign | (seg << 4) | mant) ^ _ALAW_XOR)
            .astype(np.uint8).tobytes())


# ---- IMA/DVI ADPCM (WAV fmt tag 0x11) --------------------------------
# The standard IMA step machine (IMA Recommended Practices rev 1.2 /
# Microsoft RIFF registration): 4-bit codes, an 89-entry step-size
# table, and the 8-entry index-adaptation table.  The encoder pins the
# initial step index to 0 (real encoders may optimize it per block; the
# header field carries whatever the encoder chose, so decoders are
# agnostic) — pinning makes training fabrics and the SQL oracle
# deterministic.

ADPCM_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
ADPCM_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)
ADPCM_BLOCK_ALIGN = 256  # mono: 4-byte header + 252 nibble bytes


def _adpcm_step(sample: int, pred: int, idx: int) -> tuple[int, int, int]:
    """One IMA encode step: (code, new_pred, new_idx)."""
    step = ADPCM_STEP_TABLE[idx]
    delta = sample - pred
    code = 8 if delta < 0 else 0
    delta = -delta if delta < 0 else delta
    if delta >= step:
        code |= 4
        delta -= step
    if delta >= step >> 1:
        code |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        code |= 1
    diff = (step >> 3) + ((code & 4) and step) \
        + ((code & 2) and step >> 1) + ((code & 1) and step >> 2)
    pred = pred - diff if code & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + ADPCM_INDEX_TABLE[code & 7]))
    return code, pred, idx


def _adpcm_decode_step(code: int, pred: int, idx: int) -> tuple[int, int]:
    step = ADPCM_STEP_TABLE[idx]
    diff = (step >> 3) + ((code & 4) and step) \
        + ((code & 2) and step >> 1) + ((code & 1) and step >> 2)
    pred = pred - diff if code & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + ADPCM_INDEX_TABLE[code & 7]))
    return pred, idx


def adpcm_encode_mono(samples: np.ndarray,
                      block_align: int = ADPCM_BLOCK_ALIGN) -> bytes:
    """Mono int16 samples -> IMA ADPCM blocks (header sample + nibble
    stream, low nibble first, zero-code padding to a full final
    block)."""
    s = [int(v) for v in np.asarray(samples).reshape(-1)]
    if not s:
        return b""
    per_block = (block_align - 4) * 2 + 1
    out = bytearray()
    for start in range(0, len(s), per_block):
        blk = s[start:start + per_block]
        pred, idx = blk[0], 0
        out += struct.pack("<hBB", pred, idx, 0)
        codes = []
        for v in blk[1:]:
            code, pred, idx = _adpcm_step(v, pred, idx)
            codes.append(code)
        codes += [0] * (per_block - 1 - len(codes))  # pad final block
        for lo, hi in zip(codes[0::2], codes[1::2]):
            out.append(lo | (hi << 4))
    return bytes(out)


def adpcm_decode_mono(body: bytes, n_samples: int,
                      block_align: int = ADPCM_BLOCK_ALIGN) -> np.ndarray:
    """IMA ADPCM blocks -> int32 samples, trimmed to ``n_samples``
    (the fact-chunk count)."""
    per_block = (block_align - 4) * 2 + 1
    out: list[int] = []
    for bpos in range(0, len(body), block_align):
        blk = body[bpos:bpos + block_align]
        pred, idx, _res = struct.unpack("<hBB", blk[:4])
        out.append(pred)
        for byte in blk[4:]:
            for code in (byte & 0x0F, byte >> 4):
                pred, idx = _adpcm_decode_step(code, pred, idx)
                out.append(pred)
    return np.asarray(out[:n_samples], dtype=np.int32)


def wav_header(raw: bytes) -> dict | None:
    """Strict header walk; returns fmt/data locations or None."""
    if len(raw) < 12 or raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    riff_size = struct.unpack("<I", raw[4:8])[0]
    if riff_size + 8 != len(raw):
        return None
    pos = 12
    fmt = None
    data = None
    fact = None
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        csize = struct.unpack("<I", raw[pos + 4:pos + 8])[0]
        body_end = pos + 8 + csize
        if body_end > len(raw):
            return None
        if cid == b"fmt ":
            if fmt is not None or csize < 16:
                return None
            (audio_fmt, channels, sample_rate, byte_rate, block_align,
             bits) = struct.unpack("<HHIIHH", raw[pos + 8:pos + 24])
            if channels == 0:
                return None
            spb = None
            if audio_fmt == 1:  # integer PCM
                if bits not in (8, 16):
                    return None
            elif audio_fmt in (6, 7):  # G.711 A-law / mu-law: 8-bit codes
                if bits != 8:
                    return None
            elif audio_fmt == 0x11:  # IMA/DVI ADPCM: 4-bit codes
                # strict extension: cbSize=2 + wSamplesPerBlock, the
                # block capacity identity, and the spec's byte rate
                if bits != 4 or channels != 1 or csize < 20:
                    return None
                cb, spb = struct.unpack("<HH", raw[pos + 24:pos + 28])
                if cb != 2 or block_align <= 4:
                    return None
                if spb != (block_align - 4) * 2 + 1:
                    return None
                if byte_rate != sample_rate * block_align // spb:
                    return None
            else:
                return None
            if audio_fmt != 0x11:
                if block_align != channels * bits // 8:
                    return None
                if byte_rate != sample_rate * block_align:
                    return None
            fmt = {"channels": channels, "sample_rate": sample_rate,
                   "bits": bits, "block_align": block_align,
                   "samples_per_block": spb,
                   "codec": {1: "pcm", 6: "alaw", 7: "ulaw",
                             0x11: "adpcm"}[audio_fmt]}
        elif cid == b"fact":
            if fact is not None or csize < 4:
                return None
            fact = struct.unpack("<I", raw[pos + 8:pos + 12])[0]
        elif cid == b"data":
            if data is not None or fmt is None:
                return None
            if csize % fmt["block_align"] != 0:
                return None
            data = {"pos": pos + 8, "size": csize}
        pos = body_end + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    if fmt["codec"] == "adpcm":
        # compressed formats REQUIRE a fact chunk; the count must land
        # inside the final block's capacity
        cap = data["size"] // fmt["block_align"] * fmt["samples_per_block"]
        if fact is None or fact > cap or (
                data["size"] and fact <= cap - fmt["samples_per_block"]):
            return None
        n_samples = fact
    else:
        n_samples = data["size"] // fmt["block_align"]
    return {**fmt, **{"data_pos": data["pos"], "data_size": data["size"],
                      "n_samples": n_samples}}


def wav_decode(raw: bytes) -> dict | None:
    """Strict decode to an (n_samples, channels) int32 sample array."""
    hd = wav_header(raw)
    if hd is None:
        return None
    body = raw[hd["data_pos"]:hd["data_pos"] + hd["data_size"]]
    if hd["codec"] == "ulaw":
        samples = mulaw_decode(body)
    elif hd["codec"] == "alaw":
        samples = alaw_decode(body)
    elif hd["codec"] == "adpcm":
        samples = adpcm_decode_mono(body, hd["n_samples"],
                                    hd["block_align"])
    elif hd["bits"] == 16:
        samples = np.frombuffer(body, dtype="<i2").astype(np.int32)
    else:  # 8-bit WAV is unsigned, centered at 128
        samples = np.frombuffer(body, dtype=np.uint8).astype(np.int32) - 128
    return {**hd, "samples": samples.reshape(hd["n_samples"],
                                             hd["channels"])}


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16,
               codec: str = "pcm") -> bytes:
    """(n, channels) integer samples -> a strict little-endian WAV.
    ``codec="pcm"`` stores the integers as-is (8/16-bit); ``"ulaw"`` /
    ``"alaw"`` companded-encode LINEAR samples to G.711 8-bit codes
    (fmt tags 7 / 6) — lossy by design, quantized to the companding
    grid."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    if codec == "ulaw":
        bits = 8
        fmt_tag = 7
        body = mulaw_encode(arr.reshape(-1))
    elif codec == "alaw":
        bits = 8
        fmt_tag = 6
        body = alaw_encode(arr.reshape(-1))
    elif codec == "adpcm":
        if channels != 1:
            raise ValueError("adpcm encoding is mono-only")
        bits = 4
        fmt_tag = 0x11
        body = adpcm_encode_mono(arr.reshape(-1))
    elif bits == 16:
        fmt_tag = 1
        body = arr.astype("<i2").tobytes()
    elif bits == 8:
        fmt_tag = 1
        body = (arr + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    if codec == "adpcm":
        block_align = ADPCM_BLOCK_ALIGN
        spb = (block_align - 4) * 2 + 1
        fmt = struct.pack("<HHIIHHHH", fmt_tag, channels, sample_rate,
                          sample_rate * block_align // spb, block_align,
                          bits, 2, spb)
    else:
        block_align = channels * bits // 8
        fmt = struct.pack("<HHIIHH", fmt_tag, channels, sample_rate,
                          sample_rate * block_align, block_align, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if codec == "adpcm":  # compressed formats carry the true frame count
        chunks += b"fact" + struct.pack("<II", 4, n)
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# gate parameters: 16-bit mono at 8 kHz, samples from the text's first
# WAV_SAMPLE_CAP bytes (ascii - 128, so the oracle is pure arithmetic)
WAV_RATE = 8000
WAV_SAMPLE_CAP = 256


def wav_roundtrip(docs: DataFrame) -> DataFrame:
    """Value-level audio gate: per ASCII document, synthesize a mono WAV
    whose LINEAR samples are (byte - 128) of the first
    ``WAV_SAMPLE_CAP`` text bytes — a %3 doc_id cycle over 16-bit PCM /
    G.711 MU-LAW (fmt tag 7) / G.711 A-LAW (fmt tag 6, driven r12 per
    VERDICT r11 #6) — encode it, strictly re-parse it with the real
    RIFF walk, decode (LUT expansion on the companded legs), and emit
    integer features of the DECODED samples (count, sum of squares,
    peak |value|, zero crossings, and a position-weighted sum
    ``sum((pos+1) * sample)`` that pins sample ORDER). PCM round-trips
    losslessly; the companded legs quantize to their grids — printable
    ASCII magnitudes land in segment 0 of BOTH laws, where the
    quantized value has a closed form (mu-law
    ``8 * ((132 + |v|) // 8) - 128``; A-law
    ``16 * ((|v| - 1) // 16) + 8``), so the oracle still predicts every
    column from the text alone.  Samples with |v| < 4 decode to exactly
    0 on the mu-law leg — the corpus fabric (lowercase + space,
    |v| >= 6) never produces one, so the gate's zero_crossings stays 0
    there; the 0-decode sign flip is pinned by
    ``test_wav_gate_mulaw_leg_quantizes_and_crosses_zero`` instead.
    A hash match proves encoder layout, strict parser, AND the
    bit-exact Sun/CCITT companding tables agree. Map-side only, no
    shuffle."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                raw = text.encode("utf-8")[:WAV_SAMPLE_CAP]
                samples = np.frombuffer(raw, dtype=np.uint8).astype(
                    np.int32) - 128
                # Python's % is non-negative for a positive modulus;
                # the oracle mirrors it with the pmod form
                # ((doc_id % 3) + 3) % 3, sign-stable for negative ids
                codec = ("pcm", "ulaw", "alaw")[doc_id % 3]
                wav = encode_wav(samples, WAV_RATE, codec=codec)
                dec = wav_decode(wav)
                if (dec is None or dec["n_samples"] != len(samples)
                        or dec["codec"] != codec):
                    raise AssertionError(
                        f"wav round-trip diverged for doc {doc_id}")
                s = dec["samples"][:, 0].astype(np.int64)
                nonneg = s >= 0
                zc = int((nonneg[1:] != nonneg[:-1]).sum())
                pw = int((np.arange(1, len(s) + 1, dtype=np.int64) * s).sum())
                rows.append((doc_id, codec, dec["n_samples"],
                             dec["sample_rate"], dec["channels"],
                             dec["bits"],
                             int((s * s).sum()), int(np.abs(s).max()), zc,
                             pw))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "codec", "n_samples", "sample_rate", "channels",
                "bits", "sum_sq", "peak", "zero_crossings", "pos_weighted"])

    return (
        docs.filter((F.length("text") == F.octet_length("text"))
                    & (F.length("text") >= 1)
                    # printable ASCII only: control bytes 0x00-0x04 pass
                    # the octet_length check but their mu-law magnitude
                    # leaves companding segment 0, where the oracle's
                    # closed form no longer holds
                    & ~F.col("text").rlike("[^ -~]"))
        .select("doc_id", "text")
        .mapInPandas(run, "doc_id bigint, codec string, n_samples bigint, "
                          "sample_rate bigint, channels bigint, "
                          "bits bigint, sum_sq bigint, peak bigint, "
                          "zero_crossings bigint, pos_weighted bigint")
    )


# the companding closed forms below are the SEGMENT-0 branches of the
# two G.711 laws — valid because PRINTABLE ASCII gives |v| <= 96
# (mu-law biased magnitude <= 228 < 256; A-law magnitude-1 <= 95 <
# 0xFF). octet_length alone does NOT guarantee that (control bytes
# 0x00-0x04 are single-byte but leave segment 0), so both sides filter
# to the printable range explicitly. The codec cycle uses the pmod form
# ((doc_id % 3) + 3) % 3: Python's % is non-negative for a positive
# modulus while SQL's follows the dividend's sign; pmod selects the
# same leg on both engines for ANY doc_id (ADVICE r11).
WAV_ROUNDTRIP_ORACLE = f"""
WITH t AS (
    SELECT doc_id, substring(text, 1, {WAV_SAMPLE_CAP}) AS t,
           ((doc_id % 3) + 3) % 3 AS leg
    FROM documents
    WHERE length(text) = octet_length(encode(text)) AND length(text) >= 1
      AND NOT regexp_matches(text, '[^ -~]')
), s0 AS (
    SELECT doc_id, leg, pos, ascii(substring(t, pos, 1)) - 128 AS v0
    FROM t, unnest(range(1, length(t) + 1)) AS u(pos)
), s AS (
    SELECT doc_id, leg, pos,
           CASE leg
                WHEN 1 THEN -(8 * ((132 - v0) // 8) - 128)
                WHEN 2 THEN -(16 * ((-v0 - 1) // 16) + 8)
                ELSE v0 END AS v
    FROM s0
), s2 AS (
    SELECT doc_id, leg, pos, v,
           lag(v) OVER (PARTITION BY doc_id ORDER BY pos) AS pv
    FROM s
)
SELECT doc_id,
       CASE leg WHEN 1 THEN 'ulaw' WHEN 2 THEN 'alaw' ELSE 'pcm' END AS codec,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST({WAV_RATE} AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS channels,
       CAST(CASE WHEN leg <> 0 THEN 8 ELSE 16 END AS BIGINT) AS bits,
       CAST(sum(v * v) AS BIGINT) AS sum_sq,
       CAST(max(abs(v)) AS BIGINT) AS peak,
       CAST(sum(CASE WHEN pv IS NOT NULL AND ((pv < 0) <> (v < 0))
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       CAST(sum(pos * v) AS BIGINT) AS pos_weighted
FROM s2 GROUP BY doc_id, leg
"""


def adpcm_roundtrip(docs: DataFrame) -> DataFrame:
    """Value-level IMA ADPCM gate (r13 candidate — the r12 rotation
    window is full): per ASCII document, synthesize the same
    (byte - 128) sample stream as :func:`wav_roundtrip`, encode it as a
    WAV fmt-tag-0x11 IMA ADPCM file (4-byte block header + nibble
    stream + fact chunk), strictly re-parse and decode it, and emit the
    wav gate's integer features of the DECODED samples.  ADPCM is
    stateful per sample (predictor + adaptive step index), so unlike
    the companded legs there is no closed form — the DuckDB oracle
    replays the entire state machine with a recursive CTE, one merge of
    the 89-entry step table per sample.  A hash match therefore proves
    the block layout, the strict parser (incl. fact-count trimming) and
    every step of the IMA predictor/index adaptation.  The gate's
    ``WAV_SAMPLE_CAP`` (256) fits one block, so the oracle is
    single-block by construction; multi-block encode/decode is pinned
    by pytest property tests.  Map-side only, no shuffle."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")[:WAV_SAMPLE_CAP]
                samples = np.frombuffer(raw, dtype=np.uint8).astype(
                    np.int32) - 128
                wav = encode_wav(samples, WAV_RATE, codec="adpcm")
                dec = wav_decode(wav)
                if dec is None or dec["n_samples"] != len(samples):
                    raise AssertionError(
                        f"adpcm round-trip diverged for doc {doc_id}")
                s = dec["samples"][:, 0].astype(np.int64)
                nonneg = s >= 0
                zc = int((nonneg[1:] != nonneg[:-1]).sum())
                pw = int((np.arange(1, len(s) + 1, dtype=np.int64) * s)
                         .sum())
                rows.append((int(doc_id), len(s), int((s * s).sum()),
                             int(np.abs(s).max()), zc, pw))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_samples", "sum_sq", "peak",
                "zero_crossings", "pos_weighted"])

    return (
        docs.filter((F.length("text") == F.octet_length("text"))
                    & (F.length("text") >= 1)
                    & ~F.col("text").rlike("[^ -~]"))
        .select("doc_id", "text")
        .mapInPandas(run, "doc_id bigint, n_samples bigint, "
                          "sum_sq bigint, peak bigint, "
                          "zero_crossings bigint, pos_weighted bigint")
    )


def adpcm_roundtrip_oracle_sql(table: str = "documents") -> str:
    """DuckDB replica: the full IMA state machine as a recursive CTE —
    state (doc_id, pos, pred, idx); each level consumes sample pos+1
    through the step/index VALUES tables.  decoded[0] is the block
    header's verbatim first sample; decoded[i] is the predictor after
    step i (encoder and decoder evolve the same reconstruction)."""
    steps = ", ".join(f"({i}, {v})" for i, v in enumerate(ADPCM_STEP_TABLE))
    idxs = ", ".join(f"({i}, {v})" for i, v in enumerate(ADPCM_INDEX_TABLE))
    return f"""
WITH RECURSIVE step_tab(i, st) AS (
    SELECT * FROM (VALUES {steps})
), idx_tab(c, di) AS (
    SELECT * FROM (VALUES {idxs})
), t AS (
    SELECT doc_id, substring(text, 1, {WAV_SAMPLE_CAP}) AS t
    FROM {table}
    WHERE length(text) = octet_length(encode(text)) AND length(text) >= 1
      AND NOT regexp_matches(text, '[^ -~]')
), smp AS (
    SELECT doc_id, pos, ascii(substring(t, pos, 1)) - 128 AS v,
           length(t) AS n
    FROM t, unnest(range(1, length(t) + 1)) AS u(pos)
), rec AS (
    SELECT doc_id, 1 AS pos, v AS pred, 0 AS idx, v AS dec, n
    FROM smp WHERE pos = 1
    UNION ALL
    SELECT q.doc_id, q.pos, q.pred, q.idx, q.pred AS dec, q.n FROM (
        SELECT r.doc_id, r.pos + 1 AS pos, r.n,
               greatest(-32768, least(32767,
                   r.pred + CASE WHEN s.v < r.pred THEN -1 ELSE 1 END * (
                       st.st // 8
                       + CASE WHEN abs(s.v - r.pred) >= st.st
                              THEN st.st ELSE 0 END
                       + CASE WHEN abs(s.v - r.pred)
                                   - CASE WHEN abs(s.v - r.pred) >= st.st
                                          THEN st.st ELSE 0 END
                                   >= st.st // 2
                              THEN st.st // 2 ELSE 0 END
                       + CASE WHEN abs(s.v - r.pred)
                                   - CASE WHEN abs(s.v - r.pred) >= st.st
                                          THEN st.st ELSE 0 END
                                   - CASE WHEN abs(s.v - r.pred)
                                              - CASE WHEN abs(s.v - r.pred) >= st.st
                                                     THEN st.st ELSE 0 END
                                              >= st.st // 2
                                          THEN st.st // 2 ELSE 0 END
                                   >= st.st // 4
                              THEN st.st // 4 ELSE 0 END))) AS pred,
               greatest(0, least(88, r.idx + it.di)) AS idx
        FROM rec r
        JOIN smp s ON s.doc_id = r.doc_id AND s.pos = r.pos + 1
        JOIN step_tab st ON st.i = r.idx
        JOIN idx_tab it ON it.c =
            4 * (CASE WHEN abs(s.v - r.pred) >= st.st THEN 1 ELSE 0 END)
          + 2 * (CASE WHEN abs(s.v - r.pred)
                           - CASE WHEN abs(s.v - r.pred) >= st.st
                                  THEN st.st ELSE 0 END
                           >= st.st // 2 THEN 1 ELSE 0 END)
          + (CASE WHEN abs(s.v - r.pred)
                       - CASE WHEN abs(s.v - r.pred) >= st.st
                              THEN st.st ELSE 0 END
                       - CASE WHEN abs(s.v - r.pred)
                                  - CASE WHEN abs(s.v - r.pred) >= st.st
                                         THEN st.st ELSE 0 END
                                  >= st.st // 2
                              THEN st.st // 2 ELSE 0 END
                       >= st.st // 4 THEN 1 ELSE 0 END)
    ) q WHERE q.pos <= q.n
), dec2 AS (
    SELECT doc_id, pos, dec,
           lag(dec) OVER (PARTITION BY doc_id ORDER BY pos) AS pdec
    FROM rec
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(dec * dec) AS BIGINT) AS sum_sq,
       CAST(max(abs(dec)) AS BIGINT) AS peak,
       CAST(sum(CASE WHEN pdec IS NOT NULL AND ((pdec < 0) <> (dec < 0))
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       CAST(sum(pos * dec) AS BIGINT) AS pos_weighted
FROM dec2 GROUP BY doc_id
"""
