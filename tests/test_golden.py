"""Golden-image regression: the demo scene rendered by the oracle must stay
pixel-stable (the formalization of the reference's committed
out_cpu.png / out_gpu.png visual-diff strategy, SURVEY §4)."""

import numpy as np
import pytest

from raymarching_tpu import RenderConfig, load_scene, render_ref
from raymarching_tpu.io.image import to_uint8

GOLDEN = "tests/golden/demo_96x72.png"


def _decode_png(path):
    import struct
    import zlib

    data = open(path, "rb").read()
    pos, idat, w, h, c = 8, b"", None, None, None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, _, ctype = struct.unpack(">IIBB", payload[:10])
            c = {2: 3, 6: 4}[ctype]
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * c
    rows = [np.frombuffer(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)],
                          np.uint8) for y in range(h)]
    return np.stack(rows).reshape(h, w, c)


def test_demo_matches_golden(scenes_dir):
    golden = _decode_png(GOLDEN)
    scene = load_scene(str(scenes_dir / "demo.txt"))
    cfg = RenderConfig(width=96, height=72, ssaa=1, iterations=400)
    img = to_uint8(np.asarray(render_ref(scene, cfg)))
    diff = np.abs(img.astype(int) - golden[..., :3].astype(int))
    # float-level churn may move isolated boundary pixels by a few counts
    assert np.median(diff) == 0
    assert (diff > 4).mean() < 0.005, f"max diff {diff.max()}"
