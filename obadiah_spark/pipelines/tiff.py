"""Pure-Python baseline TIFF codec — uncompressed and PackBits RGB.

The sixth real image format in the codec family (BMP / PPM / PNG /
GIF / WebP-VP8L / TIFF): a strict little- or big-endian header + IFD
walk (magic 42, monotone in-bounds entry table, the seven tags a
baseline RGB file requires, consistent strip geometry) and Apple
PackBits (TIFF 6.0 §9) run-length coding with the spec's row-boundary
reset.  Arbitrary bytes never "accidentally" parse (the multimodal
dispatch tries each codec in turn), and the encoder emits exactly the
baseline feature set the decoder validates, so roundtrips exercise
every path.

TIFF 6.0 is public (Adobe/Aldus specification); no reference-repo
counterpart (market-data engine) — LLM-pipeline multimodal brief.
"""

from __future__ import annotations

import struct

import numpy as np

# baseline RGB tag set
_T_WIDTH, _T_HEIGHT, _T_BPS, _T_COMP, _T_PHOTO = 256, 257, 258, 259, 262
_T_STRIP_OFF, _T_SPP, _T_ROWS_PER_STRIP, _T_STRIP_CNT = 273, 277, 278, 279
_COMP_NONE, _COMP_PACKBITS = 1, 32773


def packbits_encode(row: bytes) -> bytes:
    """One row of Apple PackBits: repeat runs >= 3 become (1-n, byte);
    everything else literal packets (n-1, bytes), both capped at 128."""
    out = bytearray()
    i, n = 0, len(row)
    lit_start = 0

    def flush_literal(end: int) -> None:
        j = lit_start
        while j < end:
            k = min(end - j, 128)
            out.append(k - 1)
            out.extend(row[j:j + k])
            j += k

    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            flush_literal(i)
            out.append(257 - run)  # two's complement of 1 - run
            out.append(row[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literal(n)
    return bytes(out)


def packbits_decode(data: bytes, expect: int) -> bytes | None:
    """Strict PackBits: must produce EXACTLY ``expect`` bytes and
    consume the whole input."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expect:
        h = data[i]
        i += 1
        if h < 128:  # literal of h+1 bytes
            if i + h + 1 > n:
                return None
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if i >= n:
                return None
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: noop per spec
    if len(out) != expect or i != n:
        return None
    return bytes(out)


def encode_tiff(width: int, height: int, rgb: bytes,
                packbits: bool = False, big_endian: bool = False) -> bytes:
    """Baseline RGB TIFF, one strip per image, 8 bits per sample.
    ``rgb`` shorter than ``width*height*3`` is zero-padded (the codec
    gate's text prefixes guarantee full length)."""
    need = width * height * 3
    raw = rgb[:need] + b"\x00" * (need - min(len(rgb), need))
    bo = ">" if big_endian else "<"
    if packbits:
        strip = b"".join(
            packbits_encode(raw[r * width * 3:(r + 1) * width * 3])
            for r in range(height))
        comp = _COMP_PACKBITS
    else:
        strip = raw
        comp = _COMP_NONE

    # layout: 8-byte header | BPS array (6 bytes, word-aligned) | strip
    # | IFD; offsets fixed up below
    bps_off = 8
    strip_off = bps_off + 6 + (bps_off + 6) % 2
    ifd_off = strip_off + len(strip) + (len(strip) % 2)
    entries = [
        (_T_WIDTH, 3, 1, width),
        (_T_HEIGHT, 3, 1, height),
        (_T_BPS, 3, 3, bps_off),
        (_T_COMP, 3, 1, comp),
        (_T_PHOTO, 3, 1, 2),          # RGB
        (_T_STRIP_OFF, 4, 1, strip_off),
        (_T_SPP, 3, 1, 3),
        (_T_ROWS_PER_STRIP, 3, 1, height),
        (_T_STRIP_CNT, 4, 1, len(strip)),
    ]
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(bo + "HI", 42,
                                                          ifd_off)
    out += struct.pack(bo + "HHH", 8, 8, 8)
    out += b"\x00" * (strip_off - len(out))
    out += strip
    out += b"\x00" * (ifd_off - len(out))
    out += struct.pack(bo + "H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3 and cnt == 1:  # SHORT values sit left-justified
            out += struct.pack(bo + "HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack(bo + "HHII", tag, typ, cnt, val)
    out += struct.pack(bo + "I", 0)  # no next IFD
    return bytes(out)


def tiff_decode(raw: bytes) -> dict | None:
    """Strict baseline decode → {width, height, pixels} or None."""
    if len(raw) < 8 or raw[:2] not in (b"II", b"MM"):
        return None
    bo = "<" if raw[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack(bo + "HI", raw[2:8])
    if magic != 42 or ifd_off + 2 > len(raw) or ifd_off < 8:
        return None
    (n_entries,) = struct.unpack(bo + "H", raw[ifd_off:ifd_off + 2])
    end = ifd_off + 2 + n_entries * 12 + 4
    if n_entries == 0 or end > len(raw):
        return None
    tags: dict[int, tuple[int, int, int]] = {}
    prev_tag = -1
    for e in range(n_entries):
        off = ifd_off + 2 + e * 12
        tag, typ, cnt = struct.unpack(bo + "HHI", raw[off:off + 8])
        if tag <= prev_tag:  # IFD entries must be sorted by tag
            return None
        prev_tag = tag
        if typ == 3 and cnt == 1:
            (val,) = struct.unpack(bo + "H", raw[off + 8:off + 10])
        else:
            (val,) = struct.unpack(bo + "I", raw[off + 8:off + 12])
        tags[tag] = (typ, cnt, val)
    (next_ifd,) = struct.unpack(bo + "I", raw[end - 4:end])
    if next_ifd != 0:  # single-image files only
        return None
    for t in (_T_WIDTH, _T_HEIGHT, _T_COMP, _T_PHOTO, _T_STRIP_OFF,
              _T_SPP, _T_STRIP_CNT):
        if t not in tags:
            return None
    width = tags[_T_WIDTH][2]
    height = tags[_T_HEIGHT][2]
    comp = tags[_T_COMP][2]
    if (width == 0 or height == 0 or tags[_T_PHOTO][2] != 2
            or tags[_T_SPP][2] != 3
            or comp not in (_COMP_NONE, _COMP_PACKBITS)):
        return None
    if _T_BPS in tags:
        typ, cnt, val = tags[_T_BPS]
        if typ != 3 or cnt != 3 or val + 6 > len(raw):
            return None
        if struct.unpack(bo + "HHH", raw[val:val + 6]) != (8, 8, 8):
            return None
    rows_per_strip = tags.get(_T_ROWS_PER_STRIP, (3, 1, height))[2]
    if rows_per_strip != height:  # encoder emits one strip; be strict
        return None
    s_off, s_cnt = tags[_T_STRIP_OFF][2], tags[_T_STRIP_CNT][2]
    if s_off + s_cnt > len(raw):
        return None
    strip = raw[s_off:s_off + s_cnt]
    need = width * height * 3
    if comp == _COMP_NONE:
        if s_cnt != need:
            return None
        pix = strip
    else:
        pix = packbits_decode(strip, need)
        if pix is None:
            return None
    return {"width": width, "height": height,
            "pixels": np.frombuffer(pix, dtype=np.uint8)
            .reshape(height, width, 3)}
