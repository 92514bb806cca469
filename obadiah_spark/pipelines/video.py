"""A minimal motion-JPEG container + REAL frame sampling — the video leg
of the multimodal family. ``sample_frames`` in :mod:`.multimodal` proves
the fan-out plumbing with a deterministic fake codec; this module makes
the decode itself real: a length-prefixed container of genuine baseline
JPEG frames (``MJPG`` magic, frame count, per-frame uint32 length), a
strict unpacker, and a sampler that huffman-decodes every k-th frame
through :mod:`.jpeg`.

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


# gate parameters: 4 flat-block 8x8 grayscale frames per doc, sample
# every 2nd frame (frames 0 and 2)
MJPEG_FRAMES = 4
MJPEG_EVERY = 2


def mjpeg_sample(docs: DataFrame, n_frames: int = MJPEG_FRAMES,
                 every: int = MJPEG_EVERY) -> DataFrame:
    """Value-level video gate: per ASCII document, pack ``n_frames`` real
    baseline-JPEG frames (frame i = a flat 8x8 block of text byte i —
    analytically lossless under the gate quant table), then sample every
    ``every``-th frame: container walk, length-prefix skip of unsampled
    frames, full huffman+IDCT decode of sampled ones. One output row per
    sampled frame with the decoded pixel md5; the oracle predicts it from
    the text alone, so a hash match proves container layout, the strict
    walk, and the per-frame decode end-to-end."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        want = set(range(0, n_frames, every))
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                raw = text.encode("utf-8")[:n_frames]
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
                    & (F.length("text") >= n_frames))
        .select("doc_id", "text")
        .mapInPandas(run, "doc_id bigint, frame_no int, px_md5 string")
    )


def mjpeg_sample_oracle_sql(n_frames: int = MJPEG_FRAMES,
                            every: int = MJPEG_EVERY) -> str:
    sampled = ", ".join(f"({i})" for i in range(0, n_frames, every))
    return f"""
WITH fr(frame_no) AS (
    VALUES {sampled}
)
SELECT d.doc_id,
       CAST(fr.frame_no AS INT) AS frame_no,
       md5(repeat(substring(d.text, fr.frame_no + 1, 1), 64)) AS px_md5
FROM documents d CROSS JOIN fr
WHERE length(d.text) = octet_length(encode(d.text))
  AND length(d.text) >= {n_frames}
"""
