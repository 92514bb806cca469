"""Pure-Python baseline JPEG codec (ITU-T T.81 sequential DCT, huffman).

Decoder: strict marker walk (SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/EOI),
canonical huffman entropy decode with byte-unstuffing and restart-marker
handling, dequantization, 2-D IDCT (numpy, two 8x8 matmuls per block
batch), level shift, plane assembly with chroma upsampling, and JFIF
YCbCr->RGB for 3-component images. Supported subset: 8-bit baseline,
grayscale, 4:4:4, or 4:2:0 (the dominant real-world trio),
non-progressive. Anything else — and any malformed stream — returns
None, keeping the strict-or-None contract of the other codecs in
:mod:`.multimodal` (arbitrary bytes can never "accidentally" decode).

Encoder (test/gate side): FDCT + quantize + canonical huffman with
flat-length code tables we generate ourselves (spec-valid DHT segments;
compression ratio is irrelevant here, determinism is not), grayscale or
4:4:4. With a quant table whose DC entry is 8, an image made of FLAT 8x8
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


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-stuffing marker (the caller inspects it)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0
        self.marker = None  # set when a real marker terminates the stream

    def _fill(self) -> bool:
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                return False
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.n += 8
        return True

    def bit(self) -> int | None:
        if self.n == 0 and not self._fill():
            return None
        self.n -= 1
        return (self.buf >> self.n) & 1

    def receive(self, nbits: int) -> int | None:
        v = 0
        for _ in range(nbits):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def align(self) -> None:
        self.n = 0
        self.buf = 0

    def at_marker(self) -> int | None:
        """The marker byte that stopped decoding, if any (after align)."""
        return self.marker

    def consume_marker(self) -> int | None:
        """Read a marker at the current (aligned) position."""
        self.align()
        if self.marker is None:
            # the reader may not have looked past the last data byte yet
            self._fill()
            self.buf = 0
            self.n = 0
        if self.marker is not None:
            m = self.marker
            self.marker = None
            self.pos += 2
            return m
        return None


def _huff_decode(br: _BitReader, table: dict) -> int | None:
    code = 0
    for length in range(1, 17):
        b = br.bit()
        if b is None:
            return None
        code = (code << 1) | b
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit received value to its signed
    coefficient."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


# ------------------------------------------------------------------ decode

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
            # supported layouts: grayscale, 4:4:4 (all 1x1), and 4:2:0
            # (luma 2x2, chroma 1x1) — the dominant real-world trio
            hvs = [(c["h"], c["v"]) for c in comps]
            if not (hvs == [(1, 1)] or hvs == [(1, 1)] * 3
                    or hvs == [(2, 2), (1, 1), (1, 1)]):
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
    if hd["progressive"]:
        # jpeg_header reports SOF2 dims for metadata callers, but the
        # entropy decoder below is baseline-only: a progressive stream
        # carrying baseline-shaped scan data would MISDECODE rather than
        # fail. Keep the strict-or-None contract.
        return None
    if len(raw) < 2 or raw[-2:] != b"\xff\xd9":
        return None
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
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0 or tq > 3 or p + 65 > len(seg):
                    return None
                zz = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8)
                tab = np.zeros(64)
                tab[ZIGZAG] = zz
                qtabs[tq] = tab.reshape(8, 8)
                p += 65
            if p != len(seg):
                return None
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                if tc > 1 or th > 3:
                    return None
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                if p + 17 + nv > len(seg):
                    return None
                table = _canonical_codes(bits, seg[p + 17:p + 17 + nv])
                if table is None:
                    return None
                htabs[(tc, th)] = table
                p += 17 + nv
            if p != len(seg):
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
    br = _BitReader(raw, data_pos)
    pred = [0] * ncomp
    for m in range(nmcu):
        if restart and m and m % restart == 0:
            mk = br.consume_marker()
            if mk is None or not (0xD0 <= mk <= 0xD7):
                return None
            pred = [0] * ncomp
        for ci in range(ncomp):
            dct, act, qt = comp_tabs[ci]
            for b in range(per_mcu[ci]):
                blk = np.zeros(64)
                t = _huff_decode(br, dct)
                if t is None or t > 11:
                    return None
                if t:
                    v = br.receive(t)
                    if v is None:
                        return None
                    pred[ci] += _extend(v, t)
                blk[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = _huff_decode(br, act)
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
                    v = br.receive(s)
                    if v is None:
                        return None
                    blk[ZIGZAG[k]] = _extend(v, s)
                    k += 1
                coefs[ci][m * per_mcu[ci] + b] = blk.reshape(8, 8) * qt
    br.align()
    # nothing but EOI may follow the entropy data
    end = br.pos
    if br.marker is not None:
        end = br.pos
    if raw[end:] != b"\xff\xd9":
        return None

    planes = []
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
        # crop to the component's own resolution, then upsample to full
        # frame by pixel replication (JFIF nearest-neighbor)
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        plane = plane[:ch, :cw]
        if c["v"] != vmax or c["h"] != hmax:
            plane = plane.repeat(vmax // c["v"], axis=0).repeat(
                hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if ncomp == 1:
        px = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return {"width": w, "height": h, "bpp": 8, "pixels": px.tobytes()}
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    px = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {"width": w, "height": h, "bpp": 24, "pixels": px.tobytes()}


# ------------------------------------------------------------------ encode

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def put(self, code: int, nbits: int) -> None:
        self.buf = (self.buf << nbits) | code
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.buf >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


def _flat_tables() -> tuple[list[int], bytes, list[int], bytes]:
    """Self-generated spec-valid huffman tables: 12 DC symbols at 5 bits,
    the 162 baseline AC symbols at 9 bits (code space never exhausted)."""
    dc_bits = [0] * 16
    dc_bits[4] = 12  # length 5
    dc_vals = bytes(range(12))
    ac_bits = [0] * 16
    ac_bits[8] = 162  # length 9
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                              for s in range(1, 11)]
    ac_vals = bytes(sorted(ac_syms))
    return dc_bits, dc_vals, ac_bits, ac_vals


def _enc_table(bits: list[int], vals: bytes) -> dict:
    return {sym: (length, code)
            for (length, code), sym in _canonical_codes(bits, vals).items()}


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
    """FDCT + quantize + huffman one 8x8 block; returns the new DC pred."""
    coef = _fdct2((block - 128.0)[None])[0]
    q = np.round(coef / qt).astype(int)
    diff = int(q[0, 0]) - pred
    t = diff.bit_length() if diff > 0 else (-diff).bit_length()
    length, code = dc_enc[t]
    bw.put(code, length)
    if t:
        bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    zzc = q.reshape(64)[ZIGZAG]
    run = 0
    last_nz = max((k for k in range(1, 64) if zzc[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zzc[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_enc[0xF0]
            bw.put(code, length)
            run -= 16
        s = v.bit_length() if v > 0 else (-v).bit_length()
        length, code = ac_enc[(run << 4) | s]
        bw.put(code, length)
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        length, code = ac_enc[0x00]  # EOB
        bw.put(code, length)
    return int(q[0, 0])


def encode_jpeg(width: int, height: int, pixels: bytes, channels: int = 1,
                qtable: np.ndarray = None, restart_interval: int = 0,
                subsampling: str = "444") -> bytes:
    """Baseline JPEG encode of row-major 8-bit pixels (grayscale for
    channels=1, RGB for channels=3). ``subsampling`` is "444" or "420"
    (2x2-mean chroma downsample, MCU-interleaved 4Y+Cb+Cr — the dominant
    real-world layout). The default quant table is :data:`GATE_QTABLE`.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that-many MCUs (exercising the decoder's restart path)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixels must be width*height*channels bytes")
    if subsampling not in ("444", "420") or (
            subsampling == "420" and channels != 3):
        raise ValueError("subsampling must be 444, or 420 with channels=3")
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
    else:
        samp = [(1, 1)] * channels
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # pad each component plane to its MCU-covered extent
    for ci, (sh, sv) in enumerate(samp):
        planes[ci] = _pad_to(planes[ci], mcuy * sv * 8, mcux * sh * 8)

    dc_bits, dc_vals, ac_bits, ac_vals = _flat_tables()
    dc_enc = _enc_table(dc_bits, dc_vals)
    ac_enc = _enc_table(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")
    zz = np.zeros(64, dtype=np.uint8)
    zz[:] = np.round(qt.reshape(64)[ZIGZAG]).astype(np.uint8)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(zz)
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes((ci + 1, (sh << 4) | sv, 0))
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        seg = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
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
