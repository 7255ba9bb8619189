"""Render server: drive the HTTP surface end-to-end in-process."""

import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from raymarching_tpu.serve import _make_handler


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler("jnp"))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


SCENE = """
Bounds 60.0
Camera Position 0 0 8
Light 5 8 5
Color 0.9 0.3 0.2
Sphere 0 0 -4 2
"""


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        assert r.status == 200
        assert b'"ok"' in r.read()


def test_render_png(server):
    req = urllib.request.Request(
        server + "/render?width=32&height=24&iterations=60&ssaa=1",
        data=SCENE.encode(), method="POST")
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "image/png"
        body = r.read()
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_render_ppm(server):
    req = urllib.request.Request(
        server + "/render?width=16&height=8&iterations=40&format=ppm",
        data=SCENE.encode(), method="POST")
    with urllib.request.urlopen(req) as r:
        body = r.read()
    assert body.startswith(b"P6\n16 8\n255\n")
    pixels = np.frombuffer(body.split(b"255\n", 1)[1], np.uint8)
    assert pixels.size == 16 * 8 * 3


def test_render_with_reflections(server):
    base = urllib.request.Request(
        server + "/render?width=24&height=16&iterations=80&format=ppm",
        data=SCENE.encode(), method="POST")
    refl = urllib.request.Request(
        server + "/render?width=24&height=16&iterations=80&format=ppm"
                 "&reflect=0.5",
        data=SCENE.encode(), method="POST")
    with urllib.request.urlopen(base) as r:
        a = r.read()
    with urllib.request.urlopen(refl) as r:
        b = r.read()
    assert a != b                    # reflections change the pixels


def test_aovs_zip(server):
    import io
    import zipfile

    req = urllib.request.Request(
        server + "/aovs?width=24&height=16&iterations=60&ssaa=1",
        data=SCENE.encode(), method="POST")
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/zip"
        body = r.read()
    with zipfile.ZipFile(io.BytesIO(body)) as zf:
        names = set(zf.namelist())
        assert names == {"color.png", "normal.png", "hit.png",
                         "depth.npy", "objid.npy", "shadow.npy"}
        depth = np.load(io.BytesIO(zf.read("depth.npy")))
        objid = np.load(io.BytesIO(zf.read("objid.npy")))
        shadow = np.load(io.BytesIO(zf.read("shadow.npy")))
    assert depth.shape == (16, 24) and depth.dtype == np.float32
    assert objid.shape == (16, 24) and objid.dtype == np.int32
    assert shadow.shape[:2] == (16, 24) and shadow.dtype == np.float32
    assert float(shadow.min()) >= 0.0 and float(shadow.max()) <= 1.0
    # the sphere fills the center; everything converges on Bounds or it
    assert objid[8, 12] == 1 and np.isfinite(depth[8, 12])


def test_malformed_scene_400(server):
    req = urllib.request.Request(server + "/render?width=8&height=8",
                                 data=b"Sphere 1 2 zzz 4", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server + "/nope")
    assert e.value.code == 404


@pytest.mark.parametrize("query", [
    "width=100000&height=8",          # width over cap
    "width=8&height=8&ssaa=9",        # ssaa over cap
    "width=8&height=8&iterations=0",  # iterations under floor
    "width=-2&height=8",              # negative
])
def test_oversized_request_422(server, query):
    req = urllib.request.Request(server + "/render?" + query,
                                 data=SCENE.encode(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 422


def test_animate_zip(server):
    import io
    import zipfile
    req = urllib.request.Request(
        server + "/animate?width=16&height=12&iterations=40&frames=3"
        "&orbit=90",
        data=SCENE.encode(), method="POST")
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/zip"
        body = r.read()
    with zipfile.ZipFile(io.BytesIO(body)) as zf:
        names = zf.namelist()
        assert names == ["frame_000.png", "frame_001.png", "frame_002.png"]
        frames = [zf.read(n) for n in names]
    assert all(f[:8] == b"\x89PNG\r\n\x1a\n" for f in frames)
    # the camera moved: orbit frames are not identical images
    assert frames[0] != frames[1]


def test_animate_gif(server):
    req = urllib.request.Request(
        server + "/animate?width=16&height=12&iterations=40&frames=3"
        "&format=gif&delay_cs=8",
        data=SCENE.encode(), method="POST")
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "image/gif"
        body = r.read()
    assert body[:6] == b"GIF89a"
    assert body[-1:] == b"\x3B"


def test_animate_batched_mega_matches_per_frame(server):
    """The mega backend routes /animate through render_frames (batched
    poses in one device stream); frames must be identical to the per-frame
    jnp path's output frames."""
    import io
    import zipfile

    mega_srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler("mega"))
    t = threading.Thread(target=mega_srv.serve_forever, daemon=True)
    t.start()
    mega = f"http://127.0.0.1:{mega_srv.server_address[1]}"
    try:
        q = "/animate?width=16&height=12&iterations=40&frames=3&orbit=90"
        out = {}
        for name, base in (("jnp", server), ("mega", mega)):
            req = urllib.request.Request(base + q, data=SCENE.encode(),
                                         method="POST")
            with urllib.request.urlopen(req) as r:
                with zipfile.ZipFile(io.BytesIO(r.read())) as zf:
                    out[name] = [zf.read(n) for n in sorted(zf.namelist())]
        assert len(out["mega"]) == 3
        assert all(b[:8] == b"\x89PNG\r\n\x1a\n" for b in out["mega"])
        try:
            from PIL import Image
        except ImportError:
            return
        for a, b in zip(out["jnp"], out["mega"]):
            ia = np.asarray(Image.open(io.BytesIO(a)), np.int16)
            ib = np.asarray(Image.open(io.BytesIO(b)), np.int16)
            # backends agree to float noise -> at most 1 uint8 count
            assert np.abs(ia - ib).max() <= 1
    finally:
        mega_srv.shutdown()


def test_animate_frames_cap_422(server):
    req = urllib.request.Request(
        server + "/animate?width=8&height=8&frames=100000",
        data=SCENE.encode(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 422


def test_animate_total_rays_cap_422(server):
    # frames and resolution each within range, product over the cap
    req = urllib.request.Request(
        server + "/animate?width=4096&height=4096&ssaa=4&frames=600",
        data=SCENE.encode(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 422


def test_animate_gif_pixel_cap_422(server):
    # under the ray cap (ssaa=1) but over the GIF encode-side pixel cap;
    # the same request as format=zip is only ray-capped
    req = urllib.request.Request(
        server + "/animate?width=2048&height=1024&ssaa=1&frames=24"
                 "&format=gif",
        data=SCENE.encode(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 422
    assert "GIF encode cap" in e.value.read().decode()


def test_animate_bad_center_400(server):
    req = urllib.request.Request(
        server + "/animate?width=8&height=8&frames=2&center=1,2",
        data=SCENE.encode(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_huge_body_413(server):
    from raymarching_tpu.serve import MAX_BODY_BYTES
    req = urllib.request.Request(server + "/render?width=8&height=8",
                                 data=b"#" * (MAX_BODY_BYTES + 1),
                                 method="POST")
    # The server refuses WITHOUT draining the oversized body, so under
    # load the client may see the connection reset mid-upload (URLError)
    # instead of reading the clean 413 — both prove the limit is enforced.
    with pytest.raises(urllib.error.URLError) as e:
        urllib.request.urlopen(req)
    if isinstance(e.value, urllib.error.HTTPError):
        assert e.value.code == 413
