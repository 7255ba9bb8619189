"""Reference (jnp oracle) renderer: march, shading, and small end-to-end
renders checking the semantic fine print of SURVEY §2."""

import numpy as np
import pytest

from raymarching_tpu import RenderConfig, compile_scene, parse_scene
from raymarching_tpu.core import camera as cam
from raymarching_tpu.core import shading
from raymarching_tpu.core.march import march
from raymarching_tpu.core.render import render_image, render_image_jit
from raymarching_tpu.core.sdf import scene_sd
from raymarching_tpu.scene.compile import compile_tree
from raymarching_tpu.scene.csg import ListNode, Mode, Sphere, bounds
from raymarching_tpu.scene.objects import Camera, Light


def _sphere_world(radius=2.0, color=(0.9, 0.3, 0.2)):
    tree = ListNode(Mode.UNION, [
        bounds(100.0),
        Sphere((0.0, 0.0, -5.0), radius, color=color),
    ])
    return compile_tree(tree, [Light((10.0, 10.0, 10.0))],
                        Camera(position=(0, 0, 10)))


class TestMarch:
    def test_hits_sphere_front(self):
        plan, tables = _sphere_world()
        sd_fn = lambda p: scene_sd(plan, tables, p)
        o = np.zeros((1, 3), np.float32)
        d = np.array([[0.0, 0.0, -1.0]], np.float32)
        res = march(sd_fn, o, d, 1000, 1e-3)
        assert bool(res.converged[0])
        assert float(res.sd[0]) < 1e-3
        # sphere at z=-5, r=2 -> front surface at z=-3
        np.testing.assert_allclose(np.asarray(res.position)[0],
                                   [0, 0, -3], atol=5e-3)

    def test_miss_terminates_on_bounds(self):
        plan, tables = _sphere_world()
        sd_fn = lambda p: scene_sd(plan, tables, p)
        o = np.zeros((1, 3), np.float32)
        d = np.array([[0.0, 0.0, 1.0]], np.float32)
        res = march(sd_fn, o, d, 1000, 1e-3)
        assert bool(res.converged[0])
        np.testing.assert_allclose(np.asarray(res.position)[0, 2], 50.0,
                                   atol=0.01)

    def test_while_and_scan_agree(self):
        plan, tables = _sphere_world()
        sd_fn = lambda p: scene_sd(plan, tables, p)
        rng = np.random.default_rng(1)
        d = rng.normal(size=(32, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.zeros((32, 3), np.float32)
        a = march(sd_fn, o, d, 1000, 1e-3, early_exit=True)
        b = march(sd_fn, o, d, 1000, 1e-3, differentiable=True)
        np.testing.assert_allclose(np.asarray(a.position),
                                   np.asarray(b.position), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(a.converged),
                                      np.asarray(b.converged))

    def test_hit_includes_final_substep(self):
        """Reference updates position BEFORE the break (scene.cpp:36-40):
        endpoint = pre-step point + sd * ray with sd < eps."""
        plan, tables = _sphere_world()
        sd_fn = lambda p: scene_sd(plan, tables, p)
        o = np.zeros((1, 3), np.float32)
        d = np.array([[0.0, 0.0, -1.0]], np.float32)
        res = march(sd_fn, o, d, 1000, 1e-3)
        p_prev = np.asarray(res.position) - np.asarray(res.sd)[..., None] * d
        sd_at_prev = np.asarray(sd_fn(p_prev))
        np.testing.assert_allclose(sd_at_prev, np.asarray(res.sd), atol=1e-6)


class TestShading:
    def test_normal_fd_matches_analytic_on_sphere(self):
        plan, tables = _sphere_world()
        sd_fn = lambda p: scene_sd(plan, tables, p)
        p = np.array([[0.0, 0.0, -3.0], [2.0, 0.0, -5.0]], np.float32)
        n_fd = shading.normalize(shading.normal_fd(sd_fn, p, 1e-3))
        n_an = shading.normalize(shading.normal_analytic(sd_fn, p))
        np.testing.assert_allclose(np.asarray(n_fd), np.asarray(n_an),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(n_fd)[0], [0, 0, 1], atol=1e-3)

    def test_shadow_boolean(self):
        # Blocker sphere between the surface point and the light.
        tree = ListNode(Mode.UNION, [
            bounds(100.0),
            Sphere((0.0, 0.0, -5.0), 2.0),
            Sphere((0.0, 5.0, -5.0), 1.0),  # blocker above
        ])
        plan, tables = compile_tree(tree, [], Camera())
        sd_fn = lambda p: scene_sd(plan, tables, p)
        p = np.array([[0.0, 2.0, -5.0]], np.float32)   # top of big sphere
        n = np.array([[0.0, 1.0, 0.0]], np.float32)
        light_above = np.array([0.0, 20.0, -5.0], np.float32)
        light_side = np.array([20.0, 2.5, -5.0], np.float32)
        assert bool(shading.shadowed(sd_fn, light_above, p, n, 1000,
                                     1e-3, 1e-3)[0])
        assert not bool(shading.shadowed(sd_fn, light_side, p, n, 1000,
                                         1e-3, 1e-3)[0])

    def test_lighting_clamp_saturation_floor(self):
        plan, tables = _sphere_world()
        sd_fn = lambda p: scene_sd(plan, tables, p)
        # surface point facing AWAY from the light -> negative lambert,
        # clamped up to saturation=0.05 (scene.cpp:60)
        p = np.array([[0.0, 0.0, -7.0]], np.float32)  # back of sphere
        n = np.array([[0.0, 0.0, -1.0]], np.float32)
        lp = np.array([[0.0, 0.0, 10.0]], np.float32)
        val = shading.lighting(sd_fn, lp, p, n, iterations=1000,
                               surface_eps=1e-3, offset_eps=1e-3,
                               saturation=0.05, shadows=False)
        assert float(val[0]) == pytest.approx(0.05)

    def test_lighting_upper_clamp(self):
        plan, tables = _sphere_world()
        sd_fn = lambda p: scene_sd(plan, tables, p)
        p = np.array([[0.0, 0.0, -3.0]], np.float32)
        n = np.array([[0.0, 0.0, 1.0]], np.float32)
        lp = np.array([[0.0, 0.0, 10.0], [0.0, 0.1, 10.0]], np.float32)
        val = shading.lighting(sd_fn, lp, p, n, iterations=1000,
                               surface_eps=1e-3, offset_eps=1e-3,
                               saturation=0.05, shadows=False)
        assert float(val[0]) == pytest.approx(1.0)  # two lights sum > 1


class TestRenderImage:
    CFG = RenderConfig(width=32, height=24, ssaa=1, shadows=True,
                       iterations=300)

    def test_sphere_scene_center_and_background(self, scenes_dir):
        sc = parse_scene((scenes_dir / "config1.txt").read_text())
        plan, tables = compile_scene(sc)
        img = np.asarray(render_image_jit(plan, tables, self.CFG))
        assert img.shape == (24, 32, 3)
        assert np.all(np.isfinite(img))
        # centre pixel: lit sphere -> reddish, red channel dominant
        c = img[12, 16]
        assert c[0] > 0.3 and c[0] > c[1] > c[2]
        # corner: bounds wall, black body -> exactly 0 (light * black)
        assert np.allclose(img[0, 0], 0.0, atol=1e-6)

    def test_ssaa_averages(self, scenes_dir):
        sc = parse_scene((scenes_dir / "config1.txt").read_text())
        plan, tables = compile_scene(sc)
        img1 = np.asarray(render_image_jit(plan, tables, self.CFG))
        img2 = np.asarray(render_image_jit(plan, tables,
                                       self.CFG.replace(ssaa=2)))
        # SSAA should only smooth edges; interior pixels stay close
        assert abs(float(img1[12, 16, 0]) - float(img2[12, 16, 0])) < 0.05

    def test_ray_chunking_equivalent(self, scenes_dir):
        sc = parse_scene((scenes_dir / "config1.txt").read_text())
        plan, tables = compile_scene(sc)
        a = np.asarray(render_image_jit(plan, tables, self.CFG))
        b = np.asarray(render_image_jit(plan, tables,
                                    self.CFG.replace(ray_chunk=128)))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_normal_modes_agree(self, scenes_dir):
        sc = parse_scene((scenes_dir / "config1.txt").read_text())
        plan, tables = compile_scene(sc)
        a = np.asarray(render_image_jit(plan, tables, self.CFG))
        b = np.asarray(render_image_jit(
            plan, tables, self.CFG.replace(normal_mode="analytic")))
        assert np.mean(np.abs(a - b)) < 5e-3


def test_ray_generation_geometry():
    """Rays through a known camera: the centre-ish sample of an odd kernel
    must pass near the optical axis; corners spread by the FOV."""
    tables_cam = Camera(position=(0, 0, 0), direction=(0, 0, -1),
                        up=(0, 1, 0), fov=90.0)
    plan, tables = compile_tree(ListNode(Mode.UNION, [Sphere((0, 0, -5), 1)]),
                                [], tables_cam)
    cfg = RenderConfig(width=4, height=4, ssaa=1)
    origin, dirs = cam.generate_rays(tables, cfg)
    np.testing.assert_allclose(np.asarray(origin), [0, 0, 0])
    assert dirs.shape == (4, 4, 1, 3)
    d = np.asarray(dirs)
    # FOV 90 -> focal = 2, screen x in [-1, 1]; sample (px=1, i=0) -> u=0.5
    # -> x = 0 exactly: the (1,1) ray is the -z axis.
    np.testing.assert_allclose(d[1, 1, 0], [0, 0, -1], atol=1e-6)
    # x increases with column, y decreases with row (top-left origin)
    assert d[1, 2, 0, 0] > d[1, 1, 0, 0]
    assert d[2, 1, 0, 1] < d[1, 1, 0, 1]
    # all unit length
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)


def test_ssaa_sample_positions_corner_biased():
    """SSAA sample (i, j) sits at ((i+1)/k, (j+1)/k) sub-UV — biased toward
    the bottom-right pixel corner (render.cpp:104-108), deliberately
    reproduced. With k=1 the single sample is the pixel's bottom-right
    corner, NOT its centre."""
    tables_cam = Camera(position=(0, 0, 0), direction=(0, 0, -1),
                        up=(0, 1, 0), fov=90.0)
    plan, tables = compile_tree(ListNode(Mode.UNION, [Sphere((0, 0, -5), 1)]),
                                [], tables_cam)
    cfg = RenderConfig(width=2, height=2, ssaa=1)
    _, dirs = cam.generate_rays(tables, cfg)
    d = np.asarray(dirs)
    # pixel (0,0) with k=1: u = (0+1)/2 = 0.5 -> x = 0 (the centre of the
    # IMAGE, i.e. the pixel's bottom-right corner).
    np.testing.assert_allclose(d[0, 0, 0], [0, 0, -1], atol=1e-6)
