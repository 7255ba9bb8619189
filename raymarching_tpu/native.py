"""ctypes bindings to the native host runtime (libraymarch_host.so).

The reference's host runtime is C++: scene parsing (scene.cpp:92-190), the
tree -> device-table flattener (render.cpp:246-366), and stb image writing.
Our equivalents live in native/raymarch_host.cpp, compiled to a small C-ABI
shared library; this module loads it and falls back to the pure-Python
implementations when it isn't built (pip-only environments).

Build:  make native     (or: cd native && make)
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_CANDIDATES = (
    os.path.join(_HERE, "..", "native", "libraymarch_host.so"),
    os.path.join(_HERE, "libraymarch_host.so"),
)


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for path in _CANDIDATES:
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            _configure(lib)
            _LIB = lib
            break
    return _LIB


def _configure(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)

    lib.rm_parse_scene_counts.restype = ctypes.c_int
    lib.rm_parse_scene_counts.argtypes = [ctypes.c_char_p, i32p, i32p]

    lib.rm_parse_scene_fill.restype = ctypes.c_int
    lib.rm_parse_scene_fill.argtypes = [
        ctypes.c_char_p,
        i32p,                  # prim_type [P]
        f32p, f32p, f32p,      # prim_pos, prim_aux, prim_color [P,3]
        i32p, i32p,            # group_id [P], group info...
        i32p,                  # group_meta [G, 2]: (gsign, count)
        f32p,                  # prim_scale [P]
        f32p,                  # lights [L,3]
        f32p,                  # camera [10]: pos, dir, up, fov
        f32p,                  # prim_extra [P,4]: Julia constant c
        f32p,                  # light_colors [L,3]: LightColor extension
    ]

    lib.rm_write_png.restype = ctypes.c_int
    lib.rm_write_png.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, u8p]

    if hasattr(lib, "rm_write_jpeg"):     # absent in pre-r2 builds
        lib.rm_write_jpeg.restype = ctypes.c_int
        lib.rm_write_jpeg.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                      ctypes.c_int, u8p, ctypes.c_int]


def available() -> bool:
    return load_library() is not None


def native_write_png(path: str, img: np.ndarray) -> bool:
    """Write [H, W, 3|4] uint8 as PNG via the native library.
    Returns False if the library isn't built."""
    lib = load_library()
    if lib is None:
        return False
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    rc = lib.rm_write_png(path.encode(), w, h, c,
                          img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return rc == 0


def native_write_jpeg(path: str, img: np.ndarray, quality: int = 100) -> bool:
    """Write [H, W, 3] uint8 as baseline JPEG via the native library (the
    stb_image_write twin, main.cpp:80).  Returns False if the library
    isn't built; io/jpeg.py is the pure-Python fallback."""
    lib = load_library()
    if lib is None or not hasattr(lib, "rm_write_jpeg"):
        return False
    img = np.ascontiguousarray(img[..., :3])
    h, w, _ = img.shape
    rc = lib.rm_write_jpeg(path.encode(), w, h,
                           img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           int(quality))
    return rc == 0


def native_parse_scene(text: str):
    """Parse a scene with the native parser.

    Returns (prim_type [P], prim_pos [P,3], prim_aux [P,3], prim_color
    [P,3], group_id [P], group_meta [G,2], prim_scale [P], lights [L,3],
    camera [10]) or None if the library isn't built.  Used by tests to
    cross-check the Python parser/compiler and by latency-sensitive callers
    (scene loading is host-side work, exactly what the reference kept in
    C++)."""
    lib = load_library()
    if lib is None:
        return None
    raw = text.encode()
    p_count = ctypes.c_int32(0)
    l_count = ctypes.c_int32(0)
    rc = lib.rm_parse_scene_counts(raw, ctypes.byref(p_count),
                                   ctypes.byref(l_count))
    if rc != 0:
        raise ValueError(f"native scene parse failed with code {rc}")
    P, L = max(p_count.value, 1), max(l_count.value, 1)
    G = P  # at most one group per primitive

    prim_type = np.zeros(P, np.int32)
    prim_pos = np.zeros((P, 3), np.float32)
    prim_aux = np.zeros((P, 3), np.float32)
    prim_color = np.zeros((P, 3), np.float32)
    group_id = np.zeros(P, np.int32)
    group_count = np.zeros(1, np.int32)
    group_meta = np.zeros((G, 2), np.int32)
    prim_extra = np.zeros((P, 4), np.float32)
    light_colors = np.ones((L, 3), np.float32)
    prim_scale = np.zeros(P, np.float32)
    lights = np.zeros((L, 3), np.float32)
    camera = np.zeros(10, np.float32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.rm_parse_scene_fill(
        raw,
        ptr(prim_type, ctypes.c_int32),
        ptr(prim_pos, ctypes.c_float), ptr(prim_aux, ctypes.c_float),
        ptr(prim_color, ctypes.c_float),
        ptr(group_id, ctypes.c_int32), ptr(group_count, ctypes.c_int32),
        ptr(group_meta, ctypes.c_int32),
        ptr(prim_scale, ctypes.c_float),
        ptr(lights, ctypes.c_float),
        ptr(camera, ctypes.c_float),
        ptr(prim_extra, ctypes.c_float),
        ptr(light_colors, ctypes.c_float),
    )
    if rc != 0:
        raise ValueError(f"native scene fill failed with code {rc}")
    g = group_count[0]
    # Procedural rows (type 3 Mandelbox / 4 Mandelbulb / 5 Julia) carry
    # their STRUCTURAL (param, iterations) pair in aux[1:3] — Julia's
    # 4-float quaternion constant rides prim_extra — over the C ABI;
    # split them back out into plan-static form (compile.ScenePlan.proc)
    # and zero the table slots so the differentiable aux tables match
    # scene.compile._prim_arrays.
    n = p_count.value
    _KIND = {3: "mb", 4: "bulb", 5: "julia"}

    def _param(i):
        if prim_type[i] == 5:
            return tuple(float(v) for v in prim_extra[i])
        return float(prim_aux[i, 1])

    proc = tuple(
        (int(i), _KIND[int(prim_type[i])], _param(i), int(prim_aux[i, 2]))
        for i in np.nonzero(np.isin(prim_type[:n], (3, 4, 5)))[0])
    for (i, _, _, _) in proc:
        prim_aux[i, 1:] = 0.0
    return dict(prim_type=prim_type[:p_count.value],
                prim_pos=prim_pos[:p_count.value],
                prim_aux=prim_aux[:p_count.value],
                proc=proc,
                prim_color=prim_color[:p_count.value],
                group_id=group_id[:p_count.value],
                group_meta=group_meta[:g],
                prim_scale=prim_scale[:p_count.value],
                lights=lights[:l_count.value],
                light_colors=light_colors[:l_count.value],
                camera=camera)
