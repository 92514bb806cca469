"""GIF codec: lossless round-trip, LZW dict-growth and clear handling,
interlace, strictness, dims-header agreement, dispatch integration."""
from __future__ import annotations

import hashlib

import pytest

from obadiah_spark.pipelines.gif import encode_gif, gif_decode, gif_header


def _px(w: int, h: int, ncolors: int, seed: int = 7) -> bytes:
    """Deterministic RGB buffer drawing from a bounded palette."""
    out = bytearray()
    x = seed
    for _ in range(w * h):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        c = x % ncolors
        out += bytes(((c * 37) & 0xFF, (c * 91) & 0xFF, (c * 151) & 0xFF))
    return bytes(out)


@pytest.mark.parametrize("w,h,nc", [
    (1, 1, 1), (3, 2, 4), (16, 16, 2), (40, 30, 17), (33, 7, 255),
])
def test_roundtrip_exact(w, h, nc):
    px = _px(w, h, nc)
    img = gif_decode(encode_gif(w, h, px))
    assert img is not None
    assert (img["width"], img["height"]) == (w, h)
    assert img["pixels"] == px


def test_roundtrip_large_exercises_code_growth():
    # 80x60 = 4800 pixels over 200 colors: the LZW dict passes every
    # width boundary and hits the 4096 full-table clear path
    px = _px(80, 60, 200)
    blob = encode_gif(80, 60, px)
    img = gif_decode(blob)
    assert img is not None and img["pixels"] == px


def test_multi_subblock_payload():
    # enough data that the compressed stream spans several 255-byte
    # sub-blocks
    px = _px(64, 64, 250, seed=3)
    blob = encode_gif(64, 64, px)
    assert len(blob) > 600
    img = gif_decode(blob)
    assert img is not None and img["pixels"] == px


def test_interlaced_roundtrip():
    px = _px(13, 11, 9)
    blob = encode_gif(13, 11, px, interlace=True)
    plain = encode_gif(13, 11, px)
    assert blob != plain
    img = gif_decode(blob)
    assert img is not None and img["pixels"] == px


def test_header_dims_agree():
    px = _px(5, 9, 6)
    blob = encode_gif(5, 9, px)
    hd = gif_header(blob)
    img = gif_decode(blob)
    assert (hd["width"], hd["height"]) == (img["width"], img["height"]) == (5, 9)
    assert hd["version"] == "87a"


def test_truncation_strict():
    px = _px(9, 9, 12)
    blob = encode_gif(9, 9, px)
    # every proper prefix must fail, never mis-decode
    for cut in range(1, len(blob)):
        assert gif_decode(blob[:cut]) is None, cut


def test_trailing_garbage_and_bad_magic():
    px = _px(4, 4, 3)
    blob = encode_gif(4, 4, px)
    assert gif_decode(blob + b"\x00") is None
    assert gif_decode(b"FIG87a" + blob[6:]) is None
    assert gif_decode(b"") is None
    # flip the trailer
    assert gif_decode(blob[:-1] + b"\x3a") is None


def test_corrupt_lzw_code_rejected():
    px = _px(6, 6, 5)
    blob = bytearray(encode_gif(6, 6, px))
    # flip bits deep inside the LZW payload (past header, GCT, image
    # descriptor, min-code byte and the first sub-block length byte)
    data_at = _gct_end(blob) + 10 + 2
    corrupted = 0
    for i in range(data_at, min(data_at + 12, len(blob) - 2)):
        mut = bytearray(blob)
        mut[i] ^= 0xFF
        if gif_decode(bytes(mut)) is None:
            corrupted += 1
    # strict decoder must reject (not mis-decode) a large share of
    # single-byte corruptions; the few that survive decode to different
    # pixels only if they hit still-consistent code sequences — verify
    # none returns the ORIGINAL pixels
    for i in range(data_at, min(data_at + 12, len(blob) - 2)):
        mut = bytearray(blob)
        mut[i] ^= 0xFF
        img = gif_decode(bytes(mut))
        assert img is None or img["pixels"] != px
    assert corrupted >= 6


def _gct_end(blob: bytes) -> int:
    """Offset just past the global color table."""
    return 13 + 3 * (2 << (blob[10] & 0x07))


def test_animation_out_of_scope():
    px = _px(4, 4, 3)
    blob = bytearray(encode_gif(4, 4, px))
    # splice a second image descriptor before the trailer: strict
    # single-image scope must return None, not the first frame
    body = bytes(blob[:-1])
    second = blob[_gct_end(blob):-1]  # descriptor + data of the same image
    assert gif_decode(body + second + b"\x3b") is None


def test_gif89a_extension_blocks_skipped():
    px = _px(4, 3, 4)
    blob = bytearray(encode_gif(4, 3, px))
    # rewrite magic to 89a and inject a graphic-control extension before
    # the image descriptor
    blob[3:6] = b"89a"
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    at = _gct_end(blob)
    patched = bytes(blob[:at]) + gce + bytes(blob[at:])
    img = gif_decode(patched)
    assert img is not None and img["pixels"] == px
    # a truncated extension chain is rejected
    assert gif_decode(bytes(blob[:at]) + gce[:5]) is None


def test_too_many_colors_raises():
    # 17x16 = 272 distinct colors
    px = bytearray()
    for i in range(272):
        px += bytes((i & 0xFF, (i >> 4) & 0xFF, 77))
    with pytest.raises(ValueError):
        encode_gif(17, 16, bytes(px))


def test_decode_image_dispatch_picks_gif():
    from obadiah_spark.pipelines.multimodal import decode_image, image_dims
    px = _px(6, 4, 8)
    blob = encode_gif(6, 4, px)
    img = decode_image(blob)
    assert img["pixels"] == px
    dims = image_dims(blob)
    assert (dims["width"], dims["height"]) == (6, 4)


def test_pil_interop_if_available():
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL not in container")
    import io
    px = _px(12, 10, 30)
    blob = encode_gif(12, 10, px)
    im = Image.open(io.BytesIO(blob)).convert("RGB")
    assert im.size == (12, 10)
    assert im.tobytes() == px
    assert hashlib.md5(im.tobytes()).hexdigest() == \
        hashlib.md5(px).hexdigest()


def test_property_roundtrip_hypothesis():
    """Property: ANY ≤256-color image round-trips losslessly through the
    GIF codec, interlaced or not — the palette build, LZW at every code
    width, sub-block framing, and the strict decoder all compose to the
    identity (same shape as the JPEG codec's property test)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 32), h=st.integers(1, 24),
        nc=st.integers(1, 256),
        interlace=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(w, h, nc, interlace, seed):
        rng = np.random.default_rng(seed)
        # nc palette entries, random assignment per pixel
        pal = rng.integers(0, 256, size=(nc, 3), dtype=np.uint8)
        idx = rng.integers(0, nc, size=w * h)
        px = pal[idx].tobytes()
        img = gif_decode(encode_gif(w, h, px, interlace=interlace))
        assert img is not None
        assert (img["width"], img["height"]) == (w, h)
        assert img["pixels"] == px

    check()


def test_end_code_width_boundary_regression():
    """Regression: the decoder appends an entry after the FINAL data
    code and widens when its table hits 1<<width, so END must be written
    at the widened width. This exact stream desynced the original
    next_code-driven encoder (review finding, r11): the last implicit
    append landed on the 16-entry boundary and strict decode returned
    None."""
    px = b"ecccceecceecceceececceccecceccceccec"
    img = gif_decode(encode_gif(4, 3, px))
    assert img is not None and img["pixels"] == px


def test_lzw_layer_fuzz():
    """5k random index streams through the raw LZW pair across every
    min-code-size — the layer where the width schedule lives."""
    import numpy as np
    from obadiah_spark.pipelines.gif import _lzw_decode, _lzw_encode
    rng = np.random.default_rng(42)
    for _ in range(5000):
        mcs = int(rng.integers(2, 9))
        n = int(rng.integers(1, 120))
        nsym = min(1 << mcs, 256)
        idx = rng.integers(0, nsym, size=n).astype(np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(idx, mcs), mcs, n) == idx
