"""Pure-Python GIF codec (GIF87a/GIF89a, LZW) — the palette-image leg of
the multimodal codec family.

Decoder contract matches the other real codecs (multimodal.py, jpeg.py):
**strict-or-None** — :func:`gif_decode` returns ``{"width", "height",
"pixels"}`` (row-major RGB bytes) only for a stream this module fully
validates, and ``None`` for anything malformed: bad magic, truncated
descriptors or sub-blocks, an LZW code referencing an unassigned dict
slot, a pixel count that does not equal width*height, a missing trailer,
or trailing bytes after it.  Scope is single-image GIFs (left/top 0,
image dims == logical screen) with an optional interlaced raster — the
static-image case a training corpus overwhelmingly contains; animation
(a second image descriptor) and transparency compositing return None
rather than a half-decoded frame.  GIF89a extension blocks (graphic
control, comment, application) are length-walked and skipped, strictly.

The LZW implementation is the GIF variant of Welch 1984: variable code
width starting at min_code_size+1, LSB-first bit packing, CLEAR/END
codes, dict growth to 4096 entries with deferred clear (once full, no
new entries until the encoder emits CLEAR).

Reference parity note: the reference repo has no image codecs at all —
this module exists for the LLM-pipeline brief (multimodal columns), like
jpeg.py/audio.py/video.py.
"""
from __future__ import annotations

_GIF87 = b"GIF87a"
_GIF89 = b"GIF89a"

# interlace pass layout: (first row, row step) per GIF appendix E
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _color_table(raw: bytes, off: int, packed: int) -> tuple[list[bytes], int] | None:
    """Read a color table if the packed flag says one follows."""
    if not packed & 0x80:
        return [], off
    n = 2 << (packed & 0x07)
    end = off + 3 * n
    if end > len(raw):
        return None
    table = [raw[i:i + 3] for i in range(off, end, 3)]
    return table, end


def _skip_subblocks(raw: bytes, off: int) -> int | None:
    """Walk a sub-block chain; return the offset past its terminator."""
    while True:
        if off >= len(raw):
            return None
        n = raw[off]
        off += 1
        if n == 0:
            return off
        off += n
        if off > len(raw):
            return None


def _collect_subblocks(raw: bytes, off: int) -> tuple[bytes, int] | None:
    out = bytearray()
    while True:
        if off >= len(raw):
            return None
        n = raw[off]
        off += 1
        if n == 0:
            return bytes(out), off
        if off + n > len(raw):
            return None
        out += raw[off:off + n]
        off += n


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytes | None:
    """GIF-variant LZW: returns exactly ``expect`` index bytes or None.
    Strict: unassigned codes, output overrun, running out of input
    before END, or any indices after END all fail."""
    if not 2 <= min_code_size <= 11:
        return None
    clear = 1 << min_code_size
    end = clear + 1
    # dict as a list of bytes; slots 0..clear-1 are roots (values beyond
    # the palette length are caught by the caller's palette lookup)
    roots = [bytes((i,)) for i in range(clear)]

    out = bytearray()
    table = list(roots)
    table += [b"", b""]  # clear / end placeholders
    width = min_code_size + 1
    prev: bytes | None = None

    bitpos = 0
    nbits = len(data) * 8
    finished = False
    while True:
        if bitpos + width > nbits:
            return None  # ran out of input before END
        byte = bitpos >> 3
        # codes are LSB-first: gather up to 3 bytes covering the window
        chunk = int.from_bytes(data[byte:byte + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(roots) + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            finished = True
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            return None  # unassigned code — corrupt stream
        out += entry
        if len(out) > expect:
            return None
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if not finished or len(out) != expect:
        return None
    # strict: nothing but zero padding may follow END in the final byte,
    # and no further data bytes at all (sub-block framing is the outer
    # layer's job; data here is the concatenated payload)
    if bitpos <= nbits - 8:
        # full trailing bytes after END — only all-zero padding of the
        # current byte is legal, extra bytes are not
        return None
    if bitpos < nbits:
        tail = data[-1] >> (bitpos & 7) if (bitpos & 7) else 0
        if tail:
            return None
    return bytes(out)


def gif_header(raw: bytes) -> dict | None:
    """Dims-only parse: magic + logical screen descriptor. O(1)."""
    if len(raw) < 13 or raw[:6] not in (_GIF87, _GIF89):
        return None
    width = int.from_bytes(raw[6:8], "little")
    height = int.from_bytes(raw[8:10], "little")
    if width == 0 or height == 0:
        return None
    return {"width": width, "height": height,
            "version": raw[3:6].decode("ascii")}


def gif_decode(raw: bytes) -> dict | None:
    """Strict single-image GIF → row-major RGB bytes (see module doc)."""
    hd = gif_header(raw)
    if hd is None:
        return None
    w, h = hd["width"], hd["height"]
    packed = raw[10]
    got = _color_table(raw, 13, packed)
    if got is None:
        return None
    gct, off = got

    while True:
        if off >= len(raw):
            return None
        block = raw[off]
        off += 1
        if block == 0x21:  # extension: label + sub-block chain
            if off >= len(raw):
                return None
            off = _skip_subblocks(raw, off + 1)
            if off is None:
                return None
            continue
        if block == 0x2C:
            break
        return None  # trailer before any image, or unknown block
    if off + 9 > len(raw):
        return None
    left = int.from_bytes(raw[off:off + 2], "little")
    top = int.from_bytes(raw[off + 2:off + 4], "little")
    iw = int.from_bytes(raw[off + 4:off + 6], "little")
    ih = int.from_bytes(raw[off + 6:off + 8], "little")
    ipacked = raw[off + 8]
    off += 9
    if (left, top) != (0, 0) or (iw, ih) != (w, h):
        return None  # sub-frame / offset image — out of the strict scope
    interlaced = bool(ipacked & 0x40)
    got = _color_table(raw, off, ipacked)
    if got is None:
        return None
    lct, off = got
    palette = lct if lct else gct
    if not palette:
        return None  # no color table at either level
    if off >= len(raw):
        return None
    min_code_size = raw[off]
    got2 = _collect_subblocks(raw, off + 1)
    if got2 is None:
        return None
    data, off = got2
    indices = _lzw_decode(data, min_code_size, w * h)
    if indices is None:
        return None
    if max(indices) >= len(palette):
        return None
    # single-image scope: the next block must be the trailer, then EOF
    if off >= len(raw) or raw[off] != 0x3B or off + 1 != len(raw):
        return None

    lut = b"".join(palette)
    if interlaced:
        rows = []
        order = []
        for first, step in _INTERLACE_PASSES:
            order.extend(range(first, h, step))
        src = memoryview(indices)
        rows_out: list[bytes | None] = [None] * h
        for i, row in enumerate(order):
            rows_out[row] = bytes(src[i * w:(i + 1) * w])
        flat = b"".join(rows_out)  # type: ignore[arg-type]
    else:
        flat = indices
    px = bytearray(w * h * 3)
    for i, idx in enumerate(flat):
        px[3 * i:3 * i + 3] = lut[3 * idx:3 * idx + 3]
    return {"width": w, "height": h, "pixels": bytes(px)}


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW encode with an initial CLEAR, dict growth to 4096 and a
    CLEAR+reset when full (the plain always-clear strategy — simple,
    spec-conformant, and what the strict decoder's deferred-clear path
    still accepts).

    The emit width MIRRORS THE DECODER's schedule rather than the
    encoder's own dict size: the decoder appends an entry after every
    data code except the first since CLEAR and widens the moment its
    table length reaches 1<<width — including after the FINAL data code,
    where the encoder has nothing left to add.  Driving the width off
    the encoder's next_code desyncs exactly there (the END code gets
    written one bit narrower than the decoder reads it whenever the last
    implicit append lands on a power-of-two boundary — ~2^-width of
    streams), so the width bookkeeping below simulates the decoder."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = 0
    accbits = 0
    # decoder-mirrored state: table length, current code width, and
    # whether the next data code is the first since CLEAR (no append)
    dec_len = clear + 2
    dec_width = min_code_size + 1
    dec_first = True

    def emit_raw(code: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += dec_width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    def emit_data(code: int) -> None:
        nonlocal dec_len, dec_width, dec_first
        emit_raw(code)
        if not dec_first and dec_len < 4096:
            dec_len += 1
            if dec_len == (1 << dec_width) and dec_width < 12:
                dec_width += 1
        dec_first = False

    def emit_clear() -> None:
        nonlocal dec_len, dec_width, dec_first
        emit_raw(clear)
        dec_len = clear + 2
        dec_width = min_code_size + 1
        dec_first = True

    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = end + 1
    emit_clear()
    run = b""
    for b in indices:
        cand = run + bytes((b,))
        if cand in table:
            run = cand
            continue
        emit_data(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
        else:
            emit_clear()
            table = {bytes((i,)): i for i in range(clear)}
            next_code = end + 1
        run = bytes((b,))
    if run:
        emit_data(table[run])
    emit_raw(end)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(width: int, height: int, pixels: bytes,
               interlace: bool = False) -> bytes:
    """Encode row-major RGB bytes as a single-image GIF87a (GIF is
    palette-indexed, so the image must use ≤256 distinct colors — the
    gate fabric and tests construct such images; a richer image raises).
    Lossless by construction, which is what makes the round-trip gate's
    analytic oracle possible."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer does not match dims")
    colors: dict[bytes, int] = {}
    indices = bytearray()
    for i in range(0, len(pixels), 3):
        c = pixels[i:i + 3]
        j = colors.get(c)
        if j is None:
            j = len(colors)
            if j == 256:
                raise ValueError("more than 256 distinct colors")
            colors[c] = j
        indices.append(j)
    # color table size: power of two >= max(2, n)
    bits = 1
    while (1 << bits) < len(colors):
        bits += 1
    table = list(colors)
    table += [b"\x00\x00\x00"] * ((1 << bits) - len(table))

    out = bytearray()
    out += _GIF87
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x80 | ((bits - 1) & 0x07))  # GCT present, size bits
    out += b"\x00\x00"  # bg color index, aspect
    out += b"".join(table)
    out.append(0x2C)
    out += b"\x00\x00\x00\x00"  # left, top
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x40 if interlace else 0x00)
    if interlace:
        reordered = bytearray()
        for first, step in _INTERLACE_PASSES:
            for row in range(first, height, step):
                reordered += indices[row * width:(row + 1) * width]
        indices = reordered
    min_code_size = max(2, bits)
    out.append(min_code_size)
    data = _lzw_encode(bytes(indices), min_code_size)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)      # sub-block terminator
    out.append(0x3B)   # trailer
    return bytes(out)
