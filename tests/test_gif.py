"""Animated GIF encoder: structure, LZW round-trip via an independent
spec-side decoder, and (when Pillow is present) a third-party decode."""

import numpy as np
import pytest

from raymarching_tpu.io.gif import _lzw, _palette, _quantize, encode_gif


def _lzw_decode(data: bytes, min_code_size: int):
    """Independent GIF-LZW decoder implementing the spec's reader rules
    (width grows when the slot counter fills the current width; clear
    resets) — round-tripping against this checks the encoder's
    variable-width schedule, not just self-consistency."""
    clear = 1 << min_code_size
    end = clear + 1
    pos = 0

    def read(width):
        nonlocal pos
        v = 0
        for i in range(width):
            byte = data[(pos + i) // 8]
            v |= ((byte >> ((pos + i) % 8)) & 1) << i
        pos += width
        return v

    table = [(i,) for i in range(clear)] + [None, None]
    width = min_code_size + 1
    out = []
    prev = None
    while True:
        code = read(width)
        if code == clear:
            table = table[:end + 1]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise AssertionError(f"bad code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + (entry[0],))
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return np.array(out, np.uint8)


@pytest.mark.parametrize("n", [1, 7, 300, 5000])
def test_lzw_roundtrip_random(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 252, n).astype(np.uint8)
    assert np.array_equal(_lzw_decode(_lzw(data, 8), 8), data)


def test_lzw_roundtrip_long_runs():
    # long runs force dictionary growth through every width up to reset
    data = np.repeat(np.arange(16, dtype=np.uint8), 2048)
    assert np.array_equal(_lzw_decode(_lzw(data, 8), 8), data)


def test_quantize_hits_nearest_cube_color():
    pal = _palette()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (9, 13, 3)).astype(np.uint8)
    idx = _quantize(img)
    err = np.abs(pal[idx].astype(int) - img.astype(int)).max()
    assert err <= 26  # half a 6-level quantization step (255/5/2 = 25.5)


def test_gif_structure():
    frames = [np.full((8, 10, 3), v, np.uint8) for v in (0, 128, 255)]
    data = encode_gif(frames, delay_cs=10)
    assert data[:6] == b"GIF89a"
    assert data[-1:] == b"\x3B"
    assert b"NETSCAPE2.0" in data
    w, h = int.from_bytes(data[6:8], "little"), \
        int.from_bytes(data[8:10], "little")
    assert (w, h) == (10, 8)


def test_gif_single_frame_no_loop_block():
    data = encode_gif([np.zeros((4, 4, 3), np.uint8)])
    assert b"NETSCAPE2.0" not in data


def test_gif_rejects_mismatched_frames():
    with pytest.raises(ValueError):
        encode_gif([np.zeros((4, 4, 3), np.uint8),
                    np.zeros((5, 4, 3), np.uint8)])
    with pytest.raises(ValueError):
        encode_gif([])


def test_gif_decodes_with_pillow():
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (16, 12, 3)).astype(np.uint8)
              for _ in range(3)]
    data = encode_gif(frames, delay_cs=5)
    import io as _io
    im = PIL.open(_io.BytesIO(data))
    assert im.size == (12, 16)
    assert getattr(im, "n_frames", 1) == 3
    pal = _palette()
    for k, f in enumerate(frames):
        im.seek(k)
        got = np.asarray(im.convert("RGB"))
        assert np.array_equal(got, pal[_quantize(f)])
