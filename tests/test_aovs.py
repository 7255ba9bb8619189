"""AOV rendering (api.render_aovs): depth / normal / object-id / coverage
outputs alongside the beauty image — a framework extension (the reference
pipeline writes color only, reference render.cpp:122-139)."""

import jax
import jax.numpy as jnp
import numpy as np

from raymarching_tpu import RenderConfig
from raymarching_tpu.api import render_aovs, render_tables
from raymarching_tpu.scene.compile import compile_tree
from raymarching_tpu.scene.csg import ListNode, Mode, Sphere, bounds
from raymarching_tpu.scene.objects import Camera, Light

CFG = RenderConfig(width=48, height=32, ssaa=2, iterations=150,
                   shadows=True, normal_mode="fd")


def _world():
    tree = ListNode(Mode.UNION, [
        bounds(60.0),
        Sphere((0.0, 0.0, -6.0), 2.0, color=(0.9, 0.4, 0.2)),
        Sphere((3.0, 1.0, -9.0), 1.5, color=(0.2, 0.9, 0.4)),
    ])
    return compile_tree(tree, [Light((6.0, 8.0, 4.0))],
                        Camera(position=(0, 0, 4), fov=55.0))


def test_aov_shapes_and_semantics():
    plan, tables = _world()
    aovs = render_aovs(plan, tables, CFG)
    H, W = CFG.height, CFG.width
    assert np.asarray(aovs["color"]).shape == (H, W, 3)
    assert np.asarray(aovs["depth"]).shape == (H, W)
    assert np.asarray(aovs["normal"]).shape == (H, W, 3)
    assert np.asarray(aovs["objid"]).dtype == np.int32
    hit = np.asarray(aovs["hit"])
    assert hit.min() >= 0.0 and hit.max() <= 1.0

    # color AOV == the beauty render, bitwise (same kernel launch config)
    col = np.asarray(render_tables(plan, tables, CFG, backend="mega",
                                   interpret=True))
    np.testing.assert_array_equal(np.asarray(aovs["color"]), col)

    depth = np.asarray(aovs["depth"])
    # the sphere at z=-6 r=2 from camera z=4: nearest hit ~8 units away
    assert np.isfinite(depth[hit == 1.0]).all()
    assert (depth[hit == 0.0] == np.inf).all()
    assert 7.0 < depth.min() < 9.0

    # unit normals on fully covered pixels; the sphere's center pixel
    # faces the camera (n ~ +z)
    n = np.asarray(aovs["normal"])
    norms = np.linalg.norm(n, axis=-1)
    np.testing.assert_allclose(norms[hit == 1.0], 1.0, atol=1e-5)
    cy, cx = H // 2, W // 2
    assert n[cy, cx, 2] > 0.9

    # objid: foreground sphere (leaf 1) at the center, -1 on misses
    objid = np.asarray(aovs["objid"])
    assert objid[cy, cx] == 1
    assert (objid[hit == 0.0] == -1).all()


def test_aov_fractal_scene():
    """AOVs run on procedural leaves (their winner index / kernel path)."""
    from raymarching_tpu.scene.csg import Mandelbulb

    tree = ListNode(Mode.UNION, [
        bounds(60.0),
        Mandelbulb((0.0, 0.0, -6.0), 1.5, iterations=4,
                   color=(0.4, 0.7, 0.9)),
    ])
    plan, tables = compile_tree(tree, [Light((6.0, 8.0, 4.0))],
                                Camera(position=(0, 0, 2), fov=55.0))
    aovs = render_aovs(plan, tables, CFG.replace(width=32, height=24))
    hit = np.asarray(aovs["hit"])
    objid = np.asarray(aovs["objid"])
    # rays that miss the bulb still converge on the Bounds wall (leaf 0),
    # so coverage is full — the ID channel is what separates the two
    assert (objid == 1).any()                    # the bulb is visible
    assert objid[CFG.height // 2 - 4, 16] in (0, 1)
    assert np.isfinite(np.asarray(aovs["normal"])).all()
    center_ids = objid[8:16, 12:20]
    assert (center_ids == 1).mean() > 0.5        # bulb fills the center
