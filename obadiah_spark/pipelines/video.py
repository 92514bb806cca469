"""A minimal motion-JPEG container + REAL frame sampling — the video leg
of the multimodal family: a length-prefixed container of genuine baseline
JPEG frames (``MJPG`` magic, frame count, per-frame uint32 length), a
strict unpacker, and a sampler that huffman-decodes every k-th frame
through :mod:`.jpeg`. Since round 10 the per-doc frame count is
data-dependent, so this single gate also carries the fan-out cardinality
contract that the retired fake-codec ``frame_sample`` gate used to prove.

Scale posture: per-payload work in one mapInPandas pass, frame fan-out is
a per-row yield — no shuffle; sampling every k-th frame means decode cost
is O(sampled frames), the container walk skips the rest by length prefix
(never decoding unsampled frames).
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib
import struct

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from obadiah_spark.pipelines.jpeg import encode_jpeg, jpeg_decode

_MAGIC = b"MJPG"


def mjpeg_pack(frames: list[bytes]) -> bytes:
    out = bytearray(_MAGIC + struct.pack("<I", len(frames)))
    for fr in frames:
        out += struct.pack("<I", len(fr)) + fr
    return bytes(out)


def mjpeg_unpack(raw: bytes, only: set[int] | None = None) -> list | None:
    """Strict container walk -> [(frame_no, frame_bytes)] (all frames, or
    just ``only`` — unsampled frames are SKIPPED by length prefix, their
    bytes never copied). None on any structural violation, including
    trailing garbage."""
    if len(raw) < 8 or raw[0:4] != _MAGIC:
        return None
    n = struct.unpack("<I", raw[4:8])[0]
    pos = 8
    out = []
    for i in range(n):
        if pos + 4 > len(raw):
            return None
        flen = struct.unpack("<I", raw[pos:pos + 4])[0]
        pos += 4
        if pos + flen > len(raw):
            return None
        if only is None or i in only:
            out.append((i, raw[pos:pos + flen]))
        pos += flen
    return out if pos == len(raw) else None


# gate parameters: per doc, min(length(text), MJPEG_MAX_FRAMES) flat-block
# 8x8 grayscale frames; sample every 2nd (frames 0, 2, ...). The frame
# count is DATA-DEPENDENT, so the gate also asserts the fan-out
# cardinality contract of a frame sampler (output rows vary per input
# row) — this subsumed and retired the fake-codec `frame_sample` gate in
# round 10.
MJPEG_MAX_FRAMES = 8
MJPEG_EVERY = 2


def mjpeg_sample(docs: DataFrame, max_frames: int = MJPEG_MAX_FRAMES,
                 every: int = MJPEG_EVERY) -> DataFrame:
    """Value-level video gate: per ASCII document, pack
    ``min(len(text), max_frames)`` real baseline-JPEG frames (frame i = a
    flat 8x8 block of text byte i — analytically lossless under the gate
    quant table), then sample every ``every``-th frame: container walk,
    length-prefix skip of unsampled frames, full huffman+IDCT decode of
    sampled ones. One output row per sampled frame with the decoded pixel
    md5 — a data-dependent fan-out, the real contract of a frame sampler.
    The oracle predicts every row from the text alone, so a hash match
    proves container layout, the strict walk, the per-frame decode, AND
    the fan-out cardinality end-to-end."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                raw = text.encode("utf-8")[:max_frames]
                want = set(range(0, len(raw), every))
                frames = [encode_jpeg(8, 8, bytes([b] * 64), channels=1)
                          for b in raw]
                blob = mjpeg_pack(frames)
                got = mjpeg_unpack(blob, only=want)
                if got is None or len(got) != len(want):
                    raise AssertionError(
                        f"mjpeg container walk diverged for doc {doc_id}")
                for fno, fr in got:
                    img = jpeg_decode(fr)
                    if img is None or (img["width"], img["height"]) != (8, 8):
                        raise AssertionError(
                            f"mjpeg frame decode diverged: doc {doc_id} "
                            f"frame {fno}")
                    rows.append((doc_id, fno,
                                 hashlib.md5(img["pixels"]).hexdigest()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "px_md5"])

    return (
        docs.filter((F.length("text") == F.octet_length("text"))
                    & (F.length("text") >= 1))
        .select("doc_id", "text")
        .mapInPandas(run, "doc_id bigint, frame_no int, px_md5 string")
    )


def mjpeg_sample_oracle_sql(max_frames: int = MJPEG_MAX_FRAMES,
                            every: int = MJPEG_EVERY) -> str:
    """``generate_series`` fans out the sampled indices per doc (it is
    end-inclusive, hence the -1); the frame count is data-dependent."""
    return f"""
WITH v AS (
    SELECT doc_id, text, least(length(text), {max_frames}) AS n_frames
    FROM documents
    WHERE length(text) = octet_length(encode(text)) AND length(text) >= 1
), idx AS (
    SELECT doc_id, text,
           unnest(generate_series(0, CAST(n_frames AS BIGINT) - 1, {every}))
               AS frame_no
    FROM v
)
SELECT doc_id,
       CAST(frame_no AS INT) AS frame_no,
       md5(repeat(substring(text, frame_no + 1, 1), 64)) AS px_md5
FROM idx
"""
