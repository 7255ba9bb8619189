"""GSPMD (jit + sharding annotations) render path vs shard_map path."""

import numpy as np

from raymarching_tpu import RenderConfig
from raymarching_tpu.parallel.sharded import (make_mesh, render_sharded,
                                              render_sharded_gspmd)
from raymarching_tpu.scene.compile import compile_tree
from raymarching_tpu.scene.csg import ListNode, Mode, Sphere, bounds
from raymarching_tpu.scene.objects import Camera, Light

CFG = RenderConfig(width=32, height=16, ssaa=1, iterations=100,
                   shadows=True, normal_mode="analytic")


def _world():
    tree = ListNode(Mode.UNION, [
        bounds(60.0),
        Sphere((0.0, 0.0, -6.0), 2.5, color=(0.9, 0.4, 0.2)),
    ])
    return compile_tree(tree, [Light((6.0, 8.0, 4.0))],
                        Camera(position=(0, 0, 6), fov=55.0))


def test_gspmd_matches_shard_map():
    import jax

    plan, tables = _world()
    mesh = make_mesh()
    a = np.asarray(render_sharded_gspmd(plan, tables, CFG, mesh,
                                        backend="jnp"))
    b = np.asarray(jax.jit(
        lambda t: render_sharded(plan, t, CFG, mesh, backend="jnp"))(tables))
    np.testing.assert_allclose(a, b, atol=2e-5)
