"""Native (C++) host runtime vs the Python implementation: parser/flattener
table equality on the demo scene, and PNG round-trips.  Skipped when
libraymarch_host.so isn't built (make native)."""

import io
import struct
import zlib

import numpy as np
import pytest

from raymarching_tpu import compile_scene, parse_scene
from raymarching_tpu.io.png import encode_png
from raymarching_tpu.native import (available, native_parse_scene,
                                    native_write_png)

pytestmark = pytest.mark.skipif(not available(),
                                reason="native library not built")


def _decode_png(data: bytes):
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    idat = b""
    w = h = channels = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8
            channels = {2: 3, 6: 4}[ctype]
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * channels
    rows = []
    for y in range(h):
        line = raw[y * (stride + 1): (y + 1) * (stride + 1)]
        assert line[0] == 0  # filter 0
        rows.append(np.frombuffer(line[1:], np.uint8))
    return np.stack(rows).reshape(h, w, channels)


def test_native_parser_matches_python(demo_scene_text):
    res = native_parse_scene(demo_scene_text)
    plan, tables = compile_scene(parse_scene(demo_scene_text))

    np.testing.assert_array_equal(res["prim_type"],
                                  np.asarray(plan.prim_type, np.int32))
    # Generated (Menger) positions differ by ~1 ulp: the native parser
    # accumulates in f32 like the reference's LiteMath float3, the Python
    # generator in f64 before the final cast.
    np.testing.assert_allclose(res["prim_pos"], tables.prim_pos, rtol=2e-6,
                               atol=1e-5)
    np.testing.assert_allclose(res["prim_aux"], tables.prim_aux, rtol=2e-6)
    np.testing.assert_allclose(res["prim_color"], tables.prim_color, atol=0)
    np.testing.assert_allclose(res["lights"], tables.light_pos, atol=0)
    np.testing.assert_allclose(res["camera"][:3], tables.cam_position)
    np.testing.assert_allclose(res["camera"][3:6], tables.cam_direction)
    np.testing.assert_allclose(res["camera"][6:9], tables.cam_up)
    assert res["camera"][9] == float(tables.cam_fov)

    # group structure must match the Python kernel normal form
    kp = plan.kernel
    assert kp is not None
    assert len(res["group_meta"]) == len(kp.groups)
    for g_native, g_py in zip(res["group_meta"], kp.groups):
        assert g_native[0] == g_py.gsign
        assert g_native[1] == g_py.count
    # per-prim scales
    scales = np.concatenate([np.asarray(g.scales, np.float32)
                             for g in kp.groups])
    np.testing.assert_array_equal(res["prim_scale"], scales)
    # group ids ascend contiguously
    gid = res["group_id"]
    counts = np.bincount(gid, minlength=len(kp.groups))
    np.testing.assert_array_equal(counts,
                                  [g.count for g in kp.groups])


def test_native_parser_menger4_matches_python(scenes_dir):
    """The C++ twin's Menger DFS must generalize to iters=4 (8,422-prim
    carve — the ladder's beyond-reference rung)."""
    text = (scenes_dir / "menger4.txt").read_text()
    res = native_parse_scene(text)
    plan, tables = compile_scene(parse_scene(text))
    assert res["prim_pos"].shape[0] == 8424
    np.testing.assert_array_equal(res["prim_type"],
                                  np.asarray(plan.prim_type, np.int32))
    np.testing.assert_allclose(res["prim_pos"], tables.prim_pos, rtol=2e-6,
                               atol=1e-5)
    np.testing.assert_allclose(res["prim_aux"], tables.prim_aux, rtol=2e-6)


def test_native_png_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(23, 31, 3), dtype=np.uint8)
    path = str(tmp_path / "native.png")
    assert native_write_png(path, img)
    decoded = _decode_png(open(path, "rb").read())
    np.testing.assert_array_equal(decoded, img)


def test_python_png_roundtrip():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(17, 13, 4), dtype=np.uint8)
    decoded = _decode_png(encode_png(img))
    np.testing.assert_array_equal(decoded, img)


def test_native_parser_rejects_malformed():
    with pytest.raises(ValueError):
        native_parse_scene("Sphere 1 2")


def test_native_jpeg_decodes_close(tmp_path):
    """The C++ baseline-JPEG twin (rm_write_jpeg) must decode back (via
    Pillow, an independent decoder) close to the source at quality 100,
    and within the same error envelope as the Python encoder
    (io/jpeg.py) on the same image."""
    PIL = pytest.importorskip("PIL.Image")
    from raymarching_tpu.io.jpeg import write_jpeg
    from raymarching_tpu.native import native_write_jpeg

    rng = np.random.default_rng(5)
    # smooth image (JPEG is lossy on noise): gradient + low-freq bumps
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack([
        (xx * 255 / 55), (yy * 255 / 39),
        127 + 120 * np.sin(xx / 9.0) * np.cos(yy / 7.0)], -1)
    img = np.clip(img + rng.normal(0, 2, img.shape), 0, 255).astype(np.uint8)

    npath, ppath = str(tmp_path / "n.jpg"), str(tmp_path / "p.jpg")
    if not native_write_jpeg(npath, img, quality=100):
        pytest.skip("libraymarch_host.so predates rm_write_jpeg — "
                    "re-run `make native`")
    write_jpeg(ppath, img, quality=100)
    dn = np.asarray(PIL.open(npath).convert("RGB"), np.int32)
    dp = np.asarray(PIL.open(ppath).convert("RGB"), np.int32)
    assert dn.shape == img.shape
    err_n = np.abs(dn - img.astype(np.int32)).mean()
    err_p = np.abs(dp - img.astype(np.int32)).mean()
    assert err_n < 3.0, err_n                  # quality-100 is near-lossless
    assert err_n < err_p + 0.5, (err_n, err_p)  # no worse than the twin
