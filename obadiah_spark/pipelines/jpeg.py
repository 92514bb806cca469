"""Pure-Python JPEG codec (ITU-T T.81 sequential + progressive DCT, huffman).

Decoder: strict marker walk (SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOF2/SOS/EOI),
canonical huffman entropy decode with byte-unstuffing and restart-marker
handling, dequantization, 2-D IDCT (numpy, two 8x8 matmuls per block
batch), level shift, plane assembly with chroma upsampling, and JFIF
YCbCr->RGB for 3-component images. Supported subset: 8-bit baseline
(SOF0) and progressive (SOF2 — spectral selection + successive
approximation, T.81 annex G, multi-scan with inter-scan DHT/DQT/DRI),
grayscale, 4:4:4, 4:2:0, or 4:2:2 (every common sampling layout).
Anything else — and any malformed stream, including spec-invalid
progressive scan scripts (T.81 G.1.1.1.1 progression rules) — returns
None, keeping the strict-or-None contract of the other codecs in
:mod:`.multimodal` (arbitrary bytes can never "accidentally" decode).

Encoder (test/gate side): FDCT + quantize + canonical huffman with
flat-length code tables we generate ourselves (spec-valid DHT segments;
compression ratio is irrelevant here, determinism is not), grayscale,
4:4:4, 4:2:0, or 4:2:2, baseline or progressive. With a quant table
whose DC entry is 8, an image made of FLAT 8x8
blocks round-trips EXACTLY (DC of a flat level-shifted block is 8*(v-128),
all AC vanish, and 8t/8 requantizes losslessly) — which is what lets the
``jpeg_roundtrip`` gate's oracle predict decoded pixel bytes analytically
without running a codec.

Scale posture: decode is per-payload work inside mapInPandas — no shuffle,
parallelism = input splits; the per-block IDCT is vectorized across all
blocks of an image in one einsum.
"""

from __future__ import annotations

import math
import struct
from functools import lru_cache

import numpy as np

# upper bound on width*height the decoder will allocate for — SOF dims
# go up to 64k x 64k (4.3 G pixels) and the coefficient arrays are sized
# from them before any entropy data validates
MAX_DECODE_PIXELS = 1 << 26  # 67 M pixels ~= 8192 x 8192

# zigzag index -> (row, col) linear position, T.81 figure A.6
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# orthonormal DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.array([[(math.sqrt(0.5) if u == 0 else 1.0) / 2.0
                * math.cos((2 * x + 1) * u * math.pi / 16)
                for x in range(8)] for u in range(8)])


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) spatial samples:
    out[n,x,y] = sum_uv A[u,x] c[n,u,v] A[v,y], as two broadcast matmuls
    (einsum would recompute its contraction path on every call)."""
    return _A.T @ blocks @ _A


def _fdct2(blocks: np.ndarray) -> np.ndarray:
    return _A @ blocks @ _A.T


# ------------------------------------------------------------------ huffman

def _canonical_codes(bits: list[int], vals: bytes) -> dict:
    """DHT (bits, vals) -> {(length, code): symbol} per T.81 C.2."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                return None
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        if code > (1 << length):  # overflowed the code space
            return None
        code <<= 1
    return out if k == len(vals) else None


def _split_entropy(raw: bytes, pos: int):
    """Entropy-coded data from ``pos`` → (unstuffed segments split at
    restart markers, terminating marker byte, its position). None on a
    truncated stream (0xFF with nothing after it). The decoder consumes
    segments in order; any mismatch between consumed and present segments
    is the strict-or-None contract's malformed case."""
    segs = []
    start = p = pos
    while True:
        f = raw.find(b"\xff", p)
        if f < 0 or f + 1 >= len(raw):
            return None
        nxt = raw[f + 1]
        if nxt == 0x00:
            p = f + 2
            continue
        segs.append(raw[start:f].replace(b"\xff\x00", b"\xff"))
        if 0xD0 <= nxt <= 0xD7:
            start = p = f + 2
            continue
        return segs, nxt, f


class _LazyWindows:
    """``w32``-compatible on-demand sliding windows over padded segment
    bytes — the bounded-memory fallback for oversized segments."""

    __slots__ = ("data",)

    def __init__(self, data: bytes):
        self.data = data

    def __getitem__(self, i: int) -> int:
        return int.from_bytes(self.data[i:i + 4], "big")


class _Entropy:
    """MSB-first bit reads over the unstuffed entropy segments, O(1) per
    read: a precomputed per-byte sliding 32-bit window serves any 16-bit
    peek, and huffman symbols resolve through one 65536-entry LUT lookup
    instead of a bit-at-a-time tree walk (the pre-r11 reader spent ~90%
    of decode time in that loop)."""

    __slots__ = ("segs", "i", "w32", "nbits", "pos")

    def __init__(self, segs: list[bytes]):
        self.segs = segs
        self.i = 0
        self._load(0)

    # The precomputed window list costs ~28 bytes per entropy byte — an
    # allocation amplifier an attacker-controlled payload must not steer
    # (a 100 MB "jpeg" would demand ~3 GB before any entropy validates).
    # Past this bound the windows compute on demand from the raw bytes
    # (same values, a few times slower per read, O(1) extra memory) —
    # fine for the rare legitimately-huge frame, harmless for garbage.
    _LIST_MAX_BYTES = 1 << 22  # 4 MiB per segment

    def _load(self, i: int) -> None:
        seg = self.segs[i]
        if len(seg) <= self._LIST_MAX_BYTES:
            a = np.frombuffer(seg + b"\x00\x00\x00",
                              dtype=np.uint8).astype(np.uint32)
            # plain list: CPython list indexing beats numpy scalar
            # indexing several-fold in this per-symbol hot path
            self.w32 = ((a[:-3] << 24) | (a[1:-2] << 16)
                        | (a[2:-1] << 8) | a[3:]).tolist()
        else:
            self.w32 = _LazyWindows(seg + b"\x00\x00\x00\x00")
        self.nbits = len(seg) * 8
        self.pos = 0

    def receive(self, n: int) -> int | None:
        pos = self.pos
        if pos + n > self.nbits:
            return None
        self.pos = pos + n
        return ((self.w32[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF) >> (16 - n)

    def bit(self) -> int | None:
        return self.receive(1)

    def huff(self, lut) -> int | None:
        pos = self.pos
        if pos >= self.nbits:
            return None
        p = (self.w32[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF
        s = lut[0][p]
        if s < 0 or pos + lut[1][p] > self.nbits:
            return None
        self.pos = pos + lut[1][p]
        return s

    def restart(self) -> bool:
        """Advance past an expected RSTn: the current segment must hold
        only byte-padding, and a next segment must exist (the splitter
        already guaranteed the separator was a restart marker)."""
        if self.nbits - self.pos >= 8 or self.i + 1 >= len(self.segs):
            return False
        self.i += 1
        self._load(self.i)
        return True

    def exhausted(self) -> bool:
        """True iff decoding consumed the LAST segment save padding —
        nothing but the terminating marker may follow."""
        return self.i == len(self.segs) - 1 and self.nbits - self.pos < 8


_LUT_CACHE: dict[bytes, tuple] = {}


def _huff_lut(key: bytes, table: dict) -> tuple:
    """(sym, len) 65536-entry arrays: entry p decodes the huffman symbol
    whose code prefixes the 16-bit window p (-1 = no code). Cached on the
    raw DHT table bytes — per-frame streams (MJPEG) re-declare identical
    tables every frame."""
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.full(65536, -1, dtype=np.int32)
    ln = np.zeros(65536, dtype=np.int32)
    for (length, code), s in table.items():
        lo = code << (16 - length)
        sym[lo:lo + (1 << (16 - length))] = s
        ln[lo:lo + (1 << (16 - length))] = length
    entry = (sym.tolist(), ln.tolist())  # list indexing: hot-path speed
    if len(_LUT_CACHE) > 64:  # tiny bound; tables repeat across frames
        _LUT_CACHE.clear()
    _LUT_CACHE[key] = entry
    return entry


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit received value to its signed
    coefficient."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


# ------------------------------------------------------------------ decode

def _parse_dqt(seg: bytes, qtabs: dict) -> bool:
    """DQT segment (possibly several tables) → 8-bit natural-order tables."""
    p = 0
    while p < len(seg):
        pq, tq = seg[p] >> 4, seg[p] & 15
        if pq != 0 or tq > 3 or p + 65 > len(seg):
            return False
        zz = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8)
        tab = np.zeros(64)
        tab[ZIGZAG] = zz
        qtabs[tq] = tab.reshape(8, 8)
        p += 65
    return p == len(seg)


def _parse_dht(seg: bytes, htabs: dict) -> bool:
    """DHT segment (possibly several tables) → huffman decode LUTs
    (validated through the canonical-code construction first)."""
    p = 0
    while p + 17 <= len(seg):
        tc, th = seg[p] >> 4, seg[p] & 15
        if tc > 1 or th > 3:
            return False
        bits = list(seg[p + 1:p + 17])
        nv = sum(bits)
        if p + 17 + nv > len(seg):
            return False
        raw_tab = seg[p:p + 17 + nv]
        # cache FIRST: on a hit (MJPEG re-declares identical tables every
        # frame) the canonical-code dict build is skipped entirely — only
        # valid tables are ever cached, so a hit implies validity
        lut = _LUT_CACHE.get(raw_tab)
        if lut is None:
            table = _canonical_codes(bits, seg[p + 17:p + 17 + nv])
            if table is None:
                return False
            lut = _huff_lut(raw_tab, table)
        htabs[(tc, th)] = lut
        p += 17 + nv
    return p == len(seg)


def _finish_planes(full: list[np.ndarray], comps: list[dict], w: int, h: int,
                   hmax: int, vmax: int) -> dict:
    """Full padded component planes → crop, replicate-upsample, color
    convert — the shared tail of the baseline and progressive decoders."""
    planes = []
    for plane, c in zip(full, comps):
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        plane = plane[:ch, :cw]
        if c["v"] != vmax or c["h"] != hmax:
            plane = plane.repeat(vmax // c["v"], axis=0).repeat(
                hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        px = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return {"width": w, "height": h, "bpp": 8, "pixels": px.tobytes()}
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    px = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {"width": w, "height": h, "bpp": 24, "pixels": px.tobytes()}


def jpeg_header(raw: bytes) -> dict | None:
    """Marker-walk up to SOF0 and return dims/components without entropy
    decode — the O(header) dims path. Validates the marker chain as far
    as it reads (segment lengths in bounds, baseline SOF, supported
    sampling); a payload that passes can still fail the full decode."""
    if len(raw) < 4 or raw[0:2] != b"\xff\xd8":
        return None
    pos = 2
    while True:
        if pos + 4 > len(raw) or raw[pos] != 0xFF:
            return None
        marker = raw[pos + 1]
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7):
            return None  # stray SOI / restart outside scan
        seglen = struct.unpack(">H", raw[pos + 2:pos + 4])[0]
        if seglen < 2 or pos + 2 + seglen > len(raw):
            return None
        seg = raw[pos + 4:pos + 2 + seglen]
        if marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if len(seg) < 6:
                return None
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8 or ncomp not in (1, 3) or w == 0 or h == 0:
                return None
            if len(seg) != 6 + 3 * ncomp:
                return None
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            # supported layouts: grayscale, 4:4:4 (all 1x1), 4:2:0 (luma
            # 2x2, chroma 1x1) and 4:2:2 (luma 2x1) — every common
            # real-world sampling; the decode geometry below is fully
            # parametric in (h, v) so each is just an admitted shape
            hvs = [(c["h"], c["v"]) for c in comps]
            if not (hvs == [(1, 1)] or hvs == [(1, 1)] * 3
                    or hvs == [(2, 2), (1, 1), (1, 1)]
                    or hvs == [(2, 1), (1, 1), (1, 1)]):
                return None
            return {"width": w, "height": h, "ncomp": ncomp, "comps": comps,
                    "progressive": marker == 0xC2,
                    "sof_end": pos + 2 + seglen}
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # unsupported frame type (non-huffman / lossless)
        if marker == 0xDA:  # hit SOS before any SOF
            return None
        pos += 2 + seglen


def jpeg_decode(raw: bytes) -> dict | None:
    """Full strict baseline decode; see module docstring for the supported
    subset. Returns {width, height, bpp, pixels} or None."""
    hd = jpeg_header(raw)
    if hd is None:
        return None
    if len(raw) < 2 or raw[-2:] != b"\xff\xd9":
        return None
    if hd["progressive"]:
        return _jpeg_decode_progressive(raw, hd)
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    restart = 0
    pos = 2
    scan = None
    while pos < len(raw) - 1:
        if raw[pos] != 0xFF:
            return None
        marker = raw[pos + 1]
        if marker == 0xD9:
            break
        if pos + 4 > len(raw):
            return None
        seglen = struct.unpack(">H", raw[pos + 2:pos + 4])[0]
        if seglen < 2 or pos + 2 + seglen > len(raw):
            return None
        seg = raw[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            if not _parse_dqt(seg, qtabs):
                return None
        elif marker == 0xC4:  # DHT (possibly several tables)
            if not _parse_dht(seg, htabs):
                return None
        elif marker == 0xDD:  # DRI
            if len(seg) != 2:
                return None
            restart = struct.unpack(">H", seg)[0]
        elif marker == 0xDA:  # SOS
            scan = (pos + 2 + seglen, seg)
            break
        pos += 2 + seglen
    if scan is None:
        return None
    data_pos, seg = scan
    if len(seg) < 1:
        return None
    ns = seg[0]
    if ns != hd["ncomp"] or len(seg) != 1 + 2 * ns + 3:
        return None
    comp_tabs = []
    for i in range(ns):
        cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
        td, ta = tdta >> 4, tdta & 15
        comp = next((c for c in hd["comps"] if c["id"] == cs), None)
        if comp is None or (0, td) not in htabs or (1, ta) not in htabs:
            return None
        if comp["tq"] not in qtabs:
            return None
        comp_tabs.append((htabs[(0, td)], htabs[(1, ta)], qtabs[comp["tq"]]))
    if seg[1 + 2 * ns:] != b"\x00\x3f\x00":  # baseline spectral selection
        return None

    w, h, ncomp = hd["width"], hd["height"], hd["ncomp"]
    # Allocation guard: SOF dims are attacker-controlled (up to 64k x 64k)
    # and the coefficient arrays below are sized from them BEFORE any
    # entropy data validates — cap the pixel count so a 20-byte header
    # cannot demand a multi-GiB allocation on an executor.
    if w * h > MAX_DECODE_PIXELS:
        return None
    comps = hd["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    nmcu = mcux * mcuy
    per_mcu = [c["h"] * c["v"] for c in comps]
    coefs = [np.zeros((nmcu * per_mcu[ci], 8, 8)) for ci in range(ncomp)]
    split = _split_entropy(raw, data_pos)
    if split is None:
        return None
    segs, term, term_pos = split
    # nothing but EOI may follow the entropy data
    if term != 0xD9 or term_pos != len(raw) - 2:
        return None
    ent = _Entropy(segs)
    pred = [0] * ncomp
    for m in range(nmcu):
        if restart and m and m % restart == 0:
            if not ent.restart():
                return None
            pred = [0] * ncomp
        for ci in range(ncomp):
            dct, act, qt = comp_tabs[ci]
            for b in range(per_mcu[ci]):
                blk = np.zeros(64)
                t = ent.huff(dct)
                if t is None or t > 11:
                    return None
                if t:
                    v = ent.receive(t)
                    if v is None:
                        return None
                    pred[ci] += _extend(v, t)
                blk[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = ent.huff(act)
                    if rs is None:
                        return None
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        return None
                    v = ent.receive(s)
                    if v is None:
                        return None
                    blk[ZIGZAG[k]] = _extend(v, s)
                    k += 1
                coefs[ci][m * per_mcu[ci] + b] = blk.reshape(8, 8) * qt
    if not ent.exhausted():  # leftover segments or non-padding bits
        return None

    full = []
    for ci, c in enumerate(comps):
        sp = _idct2(coefs[ci]) + 128.0
        plane = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        for idx in range(len(sp)):
            m, b = divmod(idx, per_mcu[ci])
            my, mx = divmod(m, mcux)
            byy, bxx = divmod(b, c["h"])  # within-MCU: left-to-right rows
            ry = (my * c["v"] + byy) * 8
            rx = (mx * c["h"] + bxx) * 8
            plane[ry:ry + 8, rx:rx + 8] = sp[idx]
        full.append(plane)
    return _finish_planes(full, comps, w, h, hmax, vmax)


# ------------------------------------------------- progressive decode -----
# T.81 annex G: the frame's quantized coefficients accumulate across many
# scans — DC first/refinement (interleaved or single-component, one bit per
# block per refinement pass) and AC first/refinement (always one component
# per scan, band [Ss..Se], EOB-run coded). Coefficients are kept QUANTIZED
# (integer) in zigzag order until EOI, then dequantized + IDCT'd once.

def _dc_first_block(ent, dct, coef, pred, ci, al):
    t = ent.huff(dct)
    if t is None or t > 11:
        return None
    diff = 0
    if t:
        v = ent.receive(t)
        if v is None:
            return None
        diff = _extend(v, t)
    pred[ci] += diff
    coef[0] = pred[ci] << al
    return True


def _dc_refine_block(ent, coef, al):
    b = ent.bit()
    if b is None:
        return None
    if b:
        coef[0] |= 1 << al
    return True


def _ac_first_block(ent, act, coef, ss, se, al, eobrun):
    """Returns the new EOB run, or None on a malformed stream."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = ent.huff(act)
        if rs is None:
            return None
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                ext = ent.receive(r)
                if ext is None:
                    return None
                eobrun += ext
            break
        k += r
        if k > se:
            return None
        v = ent.receive(s)
        if v is None:
            return None
        coef[k] = _extend(v, s) << al
        k += 1
    return eobrun


def _ac_refine_block(ent, act, coef, ss, se, al, eobrun):
    """T.81 G.1.2.3: one correction bit per already-nonzero coefficient in
    the band; newly-nonzero coefficients arrive as ±1<<Al. Returns the new
    EOB run, or None."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ent.huff(act)
            if rs is None:
                return None
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:  # EOBn: run of blocks with no new nonzeros
                    eobrun = 1 << r
                    if r:
                        ext = ent.receive(r)
                        if ext is None:
                            return None
                        eobrun += ext
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    return None
                b = ent.bit()
                if b is None:
                    return None
                val = p1 if b else m1
            # advance: correction bits for nonzero-history coefficients,
            # counting down r zero-history slots to the placement point
            while k <= se:
                if coef[k] != 0:
                    b = ent.bit()
                    if b is None:
                        return None
                    if b and not (coef[k] & p1):
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    return None
                coef[k] = val
            k += 1
    if eobrun > 0:
        # EOB pass: correction bits only, through the end of the band
        while k <= se:
            if coef[k] != 0:
                b = ent.bit()
                if b is None:
                    return None
                if b and not (coef[k] & p1):
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_decode_progressive(raw: bytes, hd: dict) -> dict | None:
    w, h, ncomp = hd["width"], hd["height"], hd["ncomp"]
    if w * h > MAX_DECODE_PIXELS:
        return None
    comps = hd["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    gw = [mcux * c["h"] for c in comps]   # padded (MCU-aligned) block grid
    gh = [mcuy * c["v"] for c in comps]
    # real per-component block counts (non-interleaved scans cover ONLY
    # these; the padded remainder exists just for interleaved DC scans)
    nbx, nby = [], []
    for c in comps:
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        nbx.append((cw + 7) // 8)
        nby.append((ch + 7) // 8)
    coefs = [np.zeros((gh[ci] * gw[ci], 64), dtype=np.int64)
             for ci in range(ncomp)]
    # per-(component, coefficient) successive-approximation state: the
    # Al a first scan (Ah=0) established, refined downward one bit per
    # refinement scan. _prog_scan enforces the T.81 G.1.1.1.1 progression
    # against it (DC before AC, first pass exactly once per band,
    # refinement Ah == current level) — without it, spec-malformed scan
    # scripts (e.g. AC scans with no DC scan) would "decode" to garbage
    # instead of returning None.
    prec = [[None] * 64 for _ in range(ncomp)]
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    restart = 0
    pos = 2
    nscans = 0
    ended = False
    while pos + 2 <= len(raw):
        if raw[pos] != 0xFF:
            return None
        marker = raw[pos + 1]
        if marker == 0xD9:
            ended = pos + 2 == len(raw)
            break
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7):
            return None
        if pos + 4 > len(raw):
            return None
        seglen = struct.unpack(">H", raw[pos + 2:pos + 4])[0]
        if seglen < 2 or pos + 2 + seglen > len(raw):
            return None
        seg = raw[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:
            if not _parse_dqt(seg, qtabs):
                return None
        elif marker == 0xC4:
            if not _parse_dht(seg, htabs):
                return None
        elif marker == 0xDD:
            if len(seg) != 2:
                return None
            restart = struct.unpack(">H", seg)[0]
        elif marker == 0xC2:
            pass  # the frame header itself (already validated)
        elif marker in (0xC0, 0xC1, 0xC3):
            return None  # a second frame marker is malformed
        elif marker == 0xDA:
            end = _prog_scan(raw, pos + 2 + seglen, seg, hd, coefs,
                             (mcux, mcuy, gw, nbx, nby), htabs, restart,
                             prec)
            if end is None:
                return None
            pos = end
            nscans += 1
            continue
        pos += 2 + seglen
    if not ended or nscans == 0:
        return None
    full = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qtabs:
            return None
        nat = np.zeros((len(coefs[ci]), 64))
        nat[:, ZIGZAG] = coefs[ci]           # zigzag -> natural order
        sp = _idct2(nat.reshape(-1, 8, 8) * qtabs[c["tq"]]) + 128.0
        # blocks are stored raster (by * gw + bx): one reshape assembles
        full.append(sp.reshape(gh[ci], gw[ci], 8, 8)
                    .transpose(0, 2, 1, 3).reshape(gh[ci] * 8, gw[ci] * 8))
    return _finish_planes(full, comps, w, h, hmax, vmax)


def _prog_scan(raw, data_pos, seg, hd, coefs, geom, htabs, restart,
               prec):
    """Decode one progressive SOS (header bytes in ``seg``, entropy data
    from ``data_pos``). Returns the position of the next marker, or None.
    ``prec`` carries the per-(component, coefficient) approximation state
    the progression rules are checked against."""
    mcux, mcuy, gw, nbx, nby = geom
    comps = hd["comps"]
    if len(seg) < 1:
        return None
    ns = seg[0]
    if not 1 <= ns <= hd["ncomp"] or len(seg) != 1 + 2 * ns + 3:
        return None
    ss, se, ahal = seg[-3], seg[-2], seg[-1]
    ah, al = ahal >> 4, ahal & 15
    if al > 13 or (ah and ah != al + 1):
        return None
    dc_scan = ss == 0
    if dc_scan:
        if se != 0:
            return None
    elif ns != 1 or not (1 <= ss <= se <= 63):
        return None
    scomps = []
    seen = set()
    for i in range(ns):
        cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
        td, ta = tdta >> 4, tdta & 15
        ci = next((j for j, c in enumerate(comps) if c["id"] == cs), None)
        if ci is None or ci in seen:
            return None
        seen.add(ci)
        dct = act = None
        if dc_scan and ah == 0:
            dct = htabs.get((0, td))
            if dct is None:
                return None
        if not dc_scan:
            act = htabs.get((1, ta))
            if act is None:
                return None
        # T.81 G.1.1.1.1 progression rules (libjpeg's BAD_PROGRESSION
        # cases): a component's DC scan precedes its AC scans; each
        # band's first pass (Ah=0) happens exactly once; a refinement
        # refines exactly the established level (Ah == current Al,
        # Al == Ah - 1 was checked above).
        pc = prec[ci]
        if not dc_scan and pc[0] is None:
            return None  # AC scan before the component's DC scan
        for k in range(ss, se + 1):
            if ah == 0:
                if pc[k] is not None:
                    return None  # second first-pass over a coded band
            elif pc[k] != ah:
                return None      # refinement of an un/mis-established level
            pc[k] = al
        scomps.append((ci, dct, act))
    split = _split_entropy(raw, data_pos)
    if split is None:
        return None
    segs, _term, term_pos = split
    ent = _Entropy(segs)
    eobrun = 0
    pred = [0] * hd["ncomp"]
    if ns > 1:                    # interleaved (DC scans only)
        units = mcux * mcuy
    else:
        ci0 = scomps[0][0]
        units = nbx[ci0] * nby[ci0]
    for u in range(units):
        if restart and u and u % restart == 0:
            if not ent.restart():
                return None
            pred = [0] * hd["ncomp"]
            eobrun = 0
        if ns > 1:
            my, mx = divmod(u, mcux)
            for ci, dct, _ in scomps:
                c = comps[ci]
                for j in range(c["v"]):
                    for i in range(c["h"]):
                        bidx = (my * c["v"] + j) * gw[ci] + mx * c["h"] + i
                        coef = coefs[ci][bidx]
                        ok = (_dc_first_block(ent, dct, coef, pred, ci,
                                               al)
                              if ah == 0 else _dc_refine_block(ent, coef,
                                                               al))
                        if ok is None:
                            return None
        else:
            ci, dct, act = scomps[0]
            by, bx = divmod(u, nbx[ci])
            coef = coefs[ci][by * gw[ci] + bx]
            if dc_scan:
                ok = (_dc_first_block(ent, dct, coef, pred, ci, al)
                      if ah == 0 else _dc_refine_block(ent, coef, al))
                if ok is None:
                    return None
            else:
                eobrun = (_ac_first_block(ent, act, coef, ss, se, al,
                                          eobrun)
                          if ah == 0 else
                          _ac_refine_block(ent, act, coef, ss, se, al,
                                           eobrun))
                if eobrun is None:
                    return None
    if not ent.exhausted():  # leftover segments or non-padding data bytes
        return None
    return term_pos


# ------------------------------------------------------------------ encode

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def put(self, code: int, nbits: int) -> None:
        """Append ``nbits`` MSB-first bits; ``nbits`` may span many bytes
        (callers accumulate a whole block's bits into one int). Full bytes
        flush through C-level to_bytes + replace — byte stuffing is a pure
        byte transform, so it applies after serialization."""
        buf = (self.buf << nbits) | code
        n = self.n + nbits
        nbytes = n >> 3
        if nbytes:
            n -= nbytes * 8
            chunk = (buf >> n).to_bytes(nbytes, "big")
            self.out += chunk.replace(b"\xff", b"\xff\x00")
            buf &= (1 << n) - 1
        self.buf = buf
        self.n = n

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


@lru_cache(maxsize=2)
def _flat_tables(progressive: bool = False) \
        -> tuple[tuple, bytes, tuple, bytes]:
    """Self-generated spec-valid huffman tables: 12 DC symbols at 5 bits,
    the 162 baseline AC symbols at 9 bits (code space never exhausted).
    Progressive adds the EOBn symbols (r<<4 for r=1..14, annex G EOB
    runs), which are undefined in baseline."""
    dc_bits = [0] * 16
    dc_vals = bytes(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                              for s in range(1, 11)]
    if progressive:
        ac_syms += [r << 4 for r in range(1, 15)]
    dc_bits[4] = 12  # length 5
    ac_bits = [0] * 16
    ac_bits[8] = len(ac_syms)  # length 9 (<= 176 < 2^9: space never exhausts)
    ac_vals = bytes(sorted(ac_syms))
    return tuple(dc_bits), dc_vals, tuple(ac_bits), ac_vals


@lru_cache(maxsize=8)
def _enc_table(bits: tuple, vals: tuple) -> dict:
    return {sym: (length, code)
            for (length, code), sym
            in _canonical_codes(list(bits), bytes(vals)).items()}


# the gate's quant table: DC step 8 makes flat blocks round-trip exactly
GATE_QTABLE = np.full((8, 8), 16.0)
GATE_QTABLE[0, 0] = 8.0


def _pad_to(plane: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Edge-replicate ``plane`` out to (rows, cols)."""
    r, c = plane.shape
    if r < rows:
        plane = np.vstack([plane, np.repeat(plane[-1:, :], rows - r, axis=0)])
    if c < cols:
        plane = np.hstack([plane, np.repeat(plane[:, -1:], cols - c, axis=1)])
    return plane


def _encode_block(bw: _BitWriter, block: np.ndarray, qt: np.ndarray,
                  pred: int, dc_enc: dict, ac_enc: dict) -> int:
    """FDCT + quantize + huffman one 8x8 block; returns the new DC pred.
    The block's bits accumulate in one local int and flush through a
    single ``put`` — the per-symbol writer calls were the encode
    bottleneck."""
    coef = _fdct2((block - 128.0)[None])[0]
    q = np.round(coef / qt).astype(int)
    diff = int(q[0, 0]) - pred
    t = diff.bit_length() if diff > 0 else (-diff).bit_length()
    length, acc = dc_enc[t]
    nacc = length
    if t:
        acc = (acc << t) | (diff if diff > 0 else diff + (1 << t) - 1)
        nacc += t
    zzc = q.reshape(64)[ZIGZAG].tolist()
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zzc[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zzc[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_enc[0xF0]
            acc = (acc << length) | code
            nacc += length
            run -= 16
        s = v.bit_length() if v > 0 else (-v).bit_length()
        length, code = ac_enc[(run << 4) | s]
        acc = (acc << (length + s)) \
            | ((code << s) | (v if v > 0 else v + (1 << s) - 1))
        nacc += length + s
        run = 0
    if last_nz < 63:
        length, code = ac_enc[0x00]  # EOB
        acc = (acc << length) | code
        nacc += length
    bw.put(acc, nacc)
    return int(q[0, 0])


# ------------------------------------------------- progressive encode -----

class _ProgACState:
    """Cross-block AC scan state: the pending EOB run and the correction
    bits buffered against it (T.81 annex G / the classic two-buffer
    layout). Flushing emits EOBn + its extension bits + the buffered
    correction bits, in that order."""

    def __init__(self, bw: _BitWriter, enc: dict):
        self.bw = bw
        self.enc = enc
        self.eobrun = 0
        self.bits: list[int] = []

    def flush(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            length, code = self.enc[r << 4]
            self.bw.put(code, length)
            if r:
                self.bw.put(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.bits:
            self.bw.put(b, 1)
        self.bits = []


def _enc_dc_prog(bw, dc_enc, zzblk, pred, ci, ah, al) -> None:
    if ah == 0:
        v = int(zzblk[0]) >> al  # arithmetic shift: the DC point transform
        diff = v - pred[ci]
        pred[ci] = v
        t = diff.bit_length() if diff > 0 else (-diff).bit_length()
        length, code = dc_enc[t]
        bw.put(code, length)
        if t:
            bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    else:
        bw.put((int(zzblk[0]) >> al) & 1, 1)


def _enc_ac_first(st: _ProgACState, ac_enc, zzblk, ss, se, al) -> None:
    bw = st.bw
    r = 0
    for k in range(ss, se + 1):
        v = int(zzblk[k])
        t = (abs(v) >> al)  # AC point transform truncates toward zero
        if t == 0:
            r += 1
            continue
        st.flush()
        while r > 15:
            length, code = ac_enc[0xF0]
            bw.put(code, length)
            r -= 16
        s = t.bit_length()
        length, code = ac_enc[(r << 4) | s]
        bw.put(code, length)
        bw.put(t if v > 0 else (~t) & ((1 << s) - 1), s)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush()


def _enc_ac_refine(st: _ProgACState, ac_enc, zzblk, ss, se, al) -> None:
    bw = st.bw
    absv = [(abs(int(zzblk[k])) >> al) for k in range(ss, se + 1)]
    eob_k = ss - 1  # last position that becomes newly nonzero this scan
    for idx, t in enumerate(absv):
        if t == 1:
            eob_k = ss + idx
    r = 0
    br_bits: list[int] = []
    for idx, t in enumerate(absv):
        k = ss + idx
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob_k:  # ZRL not foldable into the EOB run
            st.flush()
            length, code = ac_enc[0xF0]
            bw.put(code, length)
            r -= 16
            for b in br_bits:
                bw.put(b, 1)
            br_bits = []
        if t > 1:
            # previously-nonzero coefficient: just its next magnitude bit
            br_bits.append(t & 1)
            continue
        st.flush()
        length, code = ac_enc[(r << 4) | 1]
        bw.put(code, length)
        bw.put(1 if int(zzblk[k]) > 0 else 0, 1)
        for b in br_bits:
            bw.put(b, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        st.eobrun += 1
        st.bits.extend(br_bits)
        if st.eobrun == 0x7FFF:
            st.flush()


def _prog_scan_script(ncomp: int) -> list[tuple[list[int], int, int, int, int]]:
    """(component list, Ss, Se, Ah, Al) per scan — a libjpeg-shaped script
    that exercises every annex-G decode path: interleaved DC first +
    refinement, split AC bands, two successive-approximation levels."""
    scans = [(list(range(ncomp)), 0, 0, 0, 1),
             (list(range(ncomp)), 0, 0, 1, 0)]
    for ci in range(ncomp):
        scans += [([ci], 1, 5, 0, 2), ([ci], 6, 63, 0, 2)]
    for ah, al in ((3, 2), (2, 1), (1, 0)):
        if ah == 3:
            continue  # first scans already coded at Al=2
        for ci in range(ncomp):
            scans += [([ci], 1, 5, ah, al), ([ci], 6, 63, ah, al)]
    return scans


def encode_jpeg(width: int, height: int, pixels: bytes, channels: int = 1,
                qtable: np.ndarray = None, restart_interval: int = 0,
                subsampling: str = "444", progressive: bool = False) -> bytes:
    """Baseline or progressive JPEG encode of row-major 8-bit pixels
    (grayscale for channels=1, RGB for channels=3). ``subsampling`` is
    "444", "420" (2x2-mean chroma downsample, MCU-interleaved 4Y+Cb+Cr —
    the dominant real-world layout) or "422" (2x1-mean horizontal-only
    downsample). The default quant table is :data:`GATE_QTABLE`.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that-many MCUs (exercising the decoder's restart path)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixels must be width*height*channels bytes")
    if subsampling not in ("444", "420", "422") or (
            subsampling != "444" and channels != 3):
        raise ValueError(
            "subsampling must be 444, or 420/422 with channels=3")
    qt = GATE_QTABLE if qtable is None else np.asarray(qtable, dtype=float)
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width,
                                                        channels).astype(float)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
    else:
        planes = [arr[..., 0]]
    if subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
        # 2x2-mean chroma downsample (pad odd dims by edge replication
        # first so every 2x2 cell is full)
        for ci in (1, 2):
            p = _pad_to(planes[ci], (height + 1) // 2 * 2,
                        (width + 1) // 2 * 2)
            planes[ci] = (p[0::2, 0::2] + p[0::2, 1::2]
                          + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
    elif subsampling == "422":
        samp = [(2, 1), (1, 1), (1, 1)]
        # horizontal-only 2x1-mean chroma downsample
        for ci in (1, 2):
            p = _pad_to(planes[ci], height, (width + 1) // 2 * 2)
            planes[ci] = (p[:, 0::2] + p[:, 1::2]) / 2.0
    else:
        samp = [(1, 1)] * channels
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # pad each component plane to its MCU-covered extent
    for ci, (sh, sv) in enumerate(samp):
        planes[ci] = _pad_to(planes[ci], mcuy * sv * 8, mcux * sh * 8)

    dc_bits, dc_vals, ac_bits, ac_vals = _flat_tables(progressive)
    dc_enc = _enc_table(dc_bits, tuple(dc_vals))
    ac_enc = _enc_table(ac_bits, tuple(ac_vals))

    out = bytearray(b"\xff\xd8")
    zz = np.zeros(64, dtype=np.uint8)
    zz[:] = np.round(qt.reshape(64)[ZIGZAG]).astype(np.uint8)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(zz)
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes((ci + 1, (sh << 4) | sv, 0))
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") \
        + struct.pack(">H", 2 + len(sof)) + sof
    for tc, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        seg = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if progressive:
        _encode_progressive_scans(out, planes, samp, qt, mcux, mcuy,
                                  dc_enc, ac_enc, restart_interval,
                                  width, height, hmax, vmax)
        out += b"\xff\xd9"
        return bytes(out)
    sos = bytes([channels])
    for ci in range(channels):
        sos += bytes((ci + 1, 0x00))
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    pred = [0] * channels
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bw.out + bytes((0xFF, 0xD0 + rst))
            rst = (rst + 1) % 8
            bw = _BitWriter()
            pred = [0] * channels
        my, mx = divmod(m, mcux)
        for ci, (sh, sv) in enumerate(samp):
            for b in range(sh * sv):
                byy, bxx = divmod(b, sh)
                ys = (my * sv + byy) * 8
                xs = (mx * sh + bxx) * 8
                block = planes[ci][ys:ys + 8, xs:xs + 8]
                pred[ci] = _encode_block(bw, block, qt, pred[ci],
                                         dc_enc, ac_enc)
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def _encode_progressive_scans(out: bytearray, planes, samp, qt,
                              mcux, mcuy, dc_enc, ac_enc, restart_interval,
                              width, height, hmax, vmax) -> None:
    """Emit the full progressive scan sequence (script from
    :func:`_prog_scan_script`) into ``out``. Coefficients are quantized
    once up front; each scan re-walks them at its own band/precision."""
    ncomp = len(planes)
    zz, nbx, nby, gws = [], [], [], []
    for ci, (sh, sv) in enumerate(samp):
        p = planes[ci]  # padded to the MCU extent already
        gh_, gw_ = p.shape[0] // 8, p.shape[1] // 8
        blocks = (p.reshape(gh_, 8, gw_, 8).transpose(0, 2, 1, 3)
                  .reshape(-1, 8, 8))
        q = np.round(_fdct2(blocks - 128.0) / qt).astype(np.int64)
        zz.append(q.reshape(-1, 64)[:, ZIGZAG])
        gws.append(gw_)
        cw = (width * sh + hmax - 1) // hmax
        ch = (height * sv + vmax - 1) // vmax
        nbx.append((cw + 7) // 8)
        nby.append((ch + 7) // 8)
    for cis, ss, se, ah, al in _prog_scan_script(ncomp):
        sos = bytes([len(cis)])
        for ci in cis:
            sos += bytes((ci + 1, 0x00))
        sos += bytes((ss, se, (ah << 4) | al))
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        bw = _BitWriter()
        st = _ProgACState(bw, ac_enc)
        pred = [0] * ncomp
        rst = 0
        if len(cis) > 1:
            units = mcux * mcuy
        else:
            units = nbx[cis[0]] * nby[cis[0]]
        for u in range(units):
            if restart_interval and u and u % restart_interval == 0:
                st.flush()
                bw.flush()
                out += bw.out + bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                bw = _BitWriter()
                st = _ProgACState(bw, ac_enc)
                pred = [0] * ncomp
            if len(cis) > 1:  # interleaved DC scan over MCUs
                my, mx = divmod(u, mcux)
                for ci in cis:
                    sh, sv = samp[ci]
                    for j in range(sv):
                        for i in range(sh):
                            bidx = ((my * sv + j) * gws[ci]
                                    + mx * sh + i)
                            _enc_dc_prog(bw, dc_enc, zz[ci][bidx],
                                         pred, ci, ah, al)
            else:
                ci = cis[0]
                by, bx = divmod(u, nbx[ci])
                blk = zz[ci][by * gws[ci] + bx]
                if ss == 0:
                    _enc_dc_prog(bw, dc_enc, blk, pred, ci, ah, al)
                elif ah == 0:
                    _enc_ac_first(st, ac_enc, blk, ss, se, al)
                else:
                    _enc_ac_refine(st, ac_enc, blk, ss, se, al)
        st.flush()
        bw.flush()
        out += bw.out
