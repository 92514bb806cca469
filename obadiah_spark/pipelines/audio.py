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
            if audio_fmt != 1 or channels == 0 or bits not in (8, 16):
                return None  # integer PCM only
            if block_align != channels * bits // 8:
                return None
            if byte_rate != sample_rate * block_align:
                return None
            fmt = {"channels": channels, "sample_rate": sample_rate,
                   "bits": bits, "block_align": block_align}
        elif cid == b"data":
            if data is not None or fmt is None:
                return None
            if csize % fmt["block_align"] != 0:
                return None
            data = {"pos": pos + 8, "size": csize}
        pos = body_end + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    return {**fmt, **{"data_pos": data["pos"], "data_size": data["size"],
                      "n_samples": data["size"] // fmt["block_align"]}}


def wav_decode(raw: bytes) -> dict | None:
    """Strict decode to an (n_samples, channels) int32 sample array."""
    hd = wav_header(raw)
    if hd is None:
        return None
    body = raw[hd["data_pos"]:hd["data_pos"] + hd["data_size"]]
    if hd["bits"] == 16:
        samples = np.frombuffer(body, dtype="<i2").astype(np.int32)
    else:  # 8-bit WAV is unsigned, centered at 128
        samples = np.frombuffer(body, dtype=np.uint8).astype(np.int32) - 128
    return {**hd, "samples": samples.reshape(hd["n_samples"],
                                             hd["channels"])}


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """(n, channels) integer samples -> a strict little-endian PCM WAV."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    if bits == 16:
        body = arr.astype("<i2").tobytes()
    elif bits == 8:
        body = (arr + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# gate parameters: 16-bit mono at 8 kHz, samples from the text's first
# WAV_SAMPLE_CAP bytes (ascii - 128, so the oracle is pure arithmetic)
WAV_RATE = 8000
WAV_SAMPLE_CAP = 256


def wav_roundtrip(docs: DataFrame) -> DataFrame:
    """Value-level audio gate: per ASCII document, synthesize a 16-bit
    mono PCM WAV whose samples are (byte - 128) of the first
    ``WAV_SAMPLE_CAP`` text bytes, encode it, strictly re-parse it with
    the real RIFF walk, and emit integer features of the DECODED samples
    (count, sum of squares, peak |value|, zero crossings, and a
    position-weighted sum ``sum((pos+1) * sample)``). The LAST column is
    what pins the decoded sample ORDER on this fabric: ASCII bytes are
    32..126, so every sample is negative and zero_crossings is
    identically 0 here (kept because it is the standard audio feature and
    non-vacuous on 16-bit corpora); swapping any two unequal samples
    changes pos_weighted. Integer PCM round-trips losslessly, so the oracle predicts
    every column from the text alone — a hash match proves the encoder
    layout and the strict parser agree byte-for-byte. Map-side only, no
    shuffle."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                raw = text.encode("utf-8")[:WAV_SAMPLE_CAP]
                samples = np.frombuffer(raw, dtype=np.uint8).astype(
                    np.int32) - 128
                wav = encode_wav(samples, WAV_RATE)
                dec = wav_decode(wav)
                if dec is None or dec["n_samples"] != len(samples):
                    raise AssertionError(
                        f"wav round-trip diverged for doc {doc_id}")
                s = dec["samples"][:, 0].astype(np.int64)
                nonneg = s >= 0
                zc = int((nonneg[1:] != nonneg[:-1]).sum())
                pw = int((np.arange(1, len(s) + 1, dtype=np.int64) * s).sum())
                rows.append((doc_id, dec["n_samples"], dec["sample_rate"],
                             dec["channels"], dec["bits"],
                             int((s * s).sum()), int(np.abs(s).max()), zc,
                             pw))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_samples", "sample_rate", "channels", "bits",
                "sum_sq", "peak", "zero_crossings", "pos_weighted"])

    return (
        docs.filter((F.length("text") == F.octet_length("text"))
                    & (F.length("text") >= 1))
        .select("doc_id", "text")
        .mapInPandas(run, "doc_id bigint, n_samples bigint, "
                          "sample_rate bigint, channels bigint, "
                          "bits bigint, sum_sq bigint, peak bigint, "
                          "zero_crossings bigint, pos_weighted bigint")
    )


WAV_ROUNDTRIP_ORACLE = f"""
WITH t AS (
    SELECT doc_id, substring(text, 1, {WAV_SAMPLE_CAP}) AS t
    FROM documents
    WHERE length(text) = octet_length(encode(text)) AND length(text) >= 1
), s AS (
    SELECT doc_id, pos, ascii(substring(t, pos, 1)) - 128 AS v
    FROM t, unnest(range(1, length(t) + 1)) AS u(pos)
), s2 AS (
    SELECT doc_id, pos, v,
           lag(v) OVER (PARTITION BY doc_id ORDER BY pos) AS pv
    FROM s
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST({WAV_RATE} AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS channels,
       CAST(16 AS BIGINT) AS bits,
       CAST(sum(v * v) AS BIGINT) AS sum_sq,
       CAST(max(abs(v)) AS BIGINT) AS peak,
       CAST(sum(CASE WHEN pv IS NOT NULL AND ((pv < 0) <> (v < 0))
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       CAST(sum(pos * v) AS BIGINT) AS pos_weighted
FROM s2 GROUP BY doc_id
"""
