"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (conftest
forces --xla_force_host_platform_device_count=8): ray-sharded rendering must
be allclose to single-device, and gradient psum must reproduce single-device
gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raymarching_tpu import RenderConfig
from raymarching_tpu.api import render_tables
from raymarching_tpu.parallel.sharded import (make_mesh, mse_loss,
                                              render_sharded, train_step)
from raymarching_tpu.scene.compile import compile_tree
from raymarching_tpu.scene.csg import ListNode, Mode, Sphere, bounds
from raymarching_tpu.scene.objects import Camera, Light

CFG = RenderConfig(width=32, height=16, ssaa=1, iterations=100,
                   shadows=True, normal_mode="analytic")


def _world():
    tree = ListNode(Mode.UNION, [
        bounds(60.0),
        Sphere((0.0, 0.0, -6.0), 2.5, color=(0.9, 0.4, 0.2)),
        Sphere((3.0, 1.0, -8.0), 1.5, color=(0.2, 0.9, 0.4)),
    ])
    return compile_tree(tree, [Light((6.0, 8.0, 4.0))],
                        Camera(position=(0, 0, 6), fov=55.0))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single_device():
    plan, tables = _world()
    mesh = make_mesh()
    img_sharded = np.asarray(
        jax.jit(lambda t: render_sharded(plan, t, CFG, mesh))(tables))
    img_single = np.asarray(render_tables(plan, tables, CFG, backend="jnp"))
    np.testing.assert_allclose(img_sharded, img_single, atol=2e-5)


def test_sharded_gradients_match_single_device():
    plan, tables = _world()
    mesh = make_mesh()
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)

    g_sharded = jax.jit(jax.grad(
        lambda t: mse_loss(plan, t, target, CFG, mesh)))(tables)

    def single_loss(t):
        img = render_tables(plan, t, CFG, backend="jnp",
                            differentiable=True)
        return jnp.mean((img - target) ** 2)

    g_single = jax.grad(single_loss)(tables)
    for field in tables._fields:
        a = np.asarray(getattr(g_sharded, field), np.float64)
        b = np.asarray(getattr(g_single, field), np.float64)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a, b, rtol=0.05, atol=0.02 * scale,
                                   err_msg=f"sharded grad mismatch: {field}")


def test_train_step_reduces_loss():
    plan, tables = _world()
    mesh = make_mesh()
    # target: the same scene with the sphere shifted — fitting the scene
    # parameters back should reduce the photometric loss
    pp = np.array(tables.prim_pos)
    pp[1, 0] += 0.4
    target = jax.jit(lambda t: render_sharded(plan, t, CFG, mesh))(
        tables._replace(prim_pos=pp))

    step = jax.jit(lambda t: train_step(plan, t, target, CFG, mesh, lr=0.1))
    losses = []
    for _ in range(5):
        loss, tables = step(tables)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_uneven_rows_rejected():
    plan, tables = _world()
    mesh = make_mesh()
    with pytest.raises(ValueError, match="divisible"):
        render_sharded(plan, tables, CFG.replace(height=17), mesh)


def test_mesh_subset():
    plan, tables = _world()
    mesh = make_mesh(4)
    img = np.asarray(
        jax.jit(lambda t: render_sharded(plan, t, CFG, mesh))(tables))
    img_single = np.asarray(render_tables(plan, tables, CFG, backend="jnp"))
    np.testing.assert_allclose(img, img_single, atol=2e-5)


def test_sharded_mega_matches_single_device():
    """The production config: mega kernel under shard_map (interpret on
    the CPU mesh)."""
    plan, tables = _world()
    mesh = make_mesh(4)
    cfg = CFG.replace(normal_mode="fd")
    img = np.asarray(jax.jit(lambda t: render_sharded(
        plan, t, cfg, mesh, backend="mega", interpret=True))(tables))
    from raymarching_tpu.api import render_tables
    single = np.asarray(render_tables(plan, tables, cfg, backend="mega",
                                      interpret=True))
    np.testing.assert_allclose(img, single, atol=2e-5)


def test_sharded_mega_reflections_match_single_device():
    """Mirror bounces ride the sharded mega path unchanged: each shard's
    bounce rays stay within the shard (per-ray recursion, no cross-ray
    dependence), so sharded == single-device bitwise-close."""
    plan, tables = _world()
    mesh = make_mesh(4)
    cfg = CFG.replace(normal_mode="fd", reflect_strength=0.4)
    img = np.asarray(jax.jit(lambda t: render_sharded(
        plan, t, cfg, mesh, backend="mega", interpret=True))(tables))
    from raymarching_tpu.api import render_tables
    single = np.asarray(render_tables(plan, tables, cfg, backend="mega",
                                      interpret=True))
    np.testing.assert_allclose(img, single, atol=2e-5)


def test_sharded_reflect_gradient_descends():
    """Reflection gradients flow under shard_map: the mega anchored-replay
    backward (ops.pallas_render._reflect_bwd) runs per ray shard, and the
    scene cotangents combine in the tail psum.  At this 32x16 resolution
    the photometric landscape is bumpy (discrete pixel flips), so assert
    the two deterministic properties instead of SGD monotonicity: the
    gradient on the shifted coordinate points back toward the target, and
    a small step along -grad reduces the loss."""
    plan, tables = _world()
    mesh = make_mesh(4)
    cfg = CFG.replace(normal_mode="fd", reflect_strength=0.4)
    pp = np.array(tables.prim_pos)
    pp[1, 0] += 0.4
    target = jax.jit(lambda t: render_sharded(
        plan, t, cfg, mesh, backend="mega", interpret=True))(
        tables._replace(prim_pos=pp))

    def loss_fn(t):
        img = render_sharded(plan, t, cfg, mesh, backend="mega",
                             interpret=True)
        return jnp.mean((img - target) ** 2)

    loss0, g = jax.jit(jax.value_and_grad(loss_fn))(tables)
    assert np.isfinite(float(loss0))
    assert np.isfinite(np.asarray(g.prim_pos)).all()
    # target shifted the sphere +x: descending must push pp[1,0] up
    assert float(g.prim_pos[1, 0]) < 0.0
    stepped = jax.tree_util.tree_map(lambda x, gg: x - 0.01 * gg, tables, g)
    loss1 = float(jax.jit(loss_fn)(stepped))
    assert loss1 < float(loss0)


def test_render_rays_sharded_matches_single_device():
    """Arbitrary bundles (per-ray origins, non-divisible R forcing the
    internal pad) sharded over the mesh == api.render_rays single-device;
    tables gradients agree after the psum."""
    from raymarching_tpu.api import render_rays
    from raymarching_tpu.parallel.sharded import render_rays_sharded

    plan, tables = _world()
    mesh = make_mesh(4)
    cfg = CFG.replace(width=16, height=8)
    from raymarching_tpu.core.camera import generate_rays
    o, d = generate_rays(tables, cfg)
    d = d.reshape(-1, 3)[:101]                  # 101 rays: not % 4
    o = np.broadcast_to(np.asarray(o), d.shape).copy()
    single = np.asarray(render_rays(plan, tables, o, d, cfg,
                                    interpret=True))
    shard = np.asarray(jax.jit(lambda t: render_rays_sharded(
        plan, t, o, d, cfg, mesh, interpret=True))(tables))
    np.testing.assert_allclose(shard, single, atol=2e-5)

    g1 = jax.grad(lambda t: jnp.mean(render_rays(
        plan, t, o, d, cfg, interpret=True)))(tables)
    g2 = jax.jit(jax.grad(lambda t: jnp.mean(render_rays_sharded(
        plan, t, o, d, cfg, mesh, interpret=True))))(tables)
    for f in ("prim_pos", "prim_color", "light_pos"):
        np.testing.assert_allclose(np.asarray(getattr(g2, f)),
                                   np.asarray(getattr(g1, f)),
                                   rtol=1e-4, atol=1e-6, err_msg=f)


def _fused_world():
    """Demo-generator scene: MengerSponge + DeathStar — both fused
    provenances the bench headline regime folds in-kernel."""
    from raymarching_tpu.scene.generators import death_star, menger_sponge

    tree = ListNode(Mode.UNION, [
        bounds(60.0),
        menger_sponge((0.0, 0.0, -8.0), 6.0, 2, color=(0.9, 0.9, 0.8)),
        death_star((4.0, 1.0, -6.0), 1.8, color=(0.2, 0.4, 0.9)),
        Sphere((-3.0, -1.0, -5.0), 1.0, color=(0.2, 0.8, 0.3)),
    ])
    return compile_tree(tree, [Light((6.0, 10.0, 4.0)),
                               Light((-6.0, 4.0, 2.0))],
                        Camera(position=(0, 1, 5), fov=60.0))


def test_sharded_fused_headline_regime_matches_single_device():
    """The BENCH HEADLINE regime under shard_map: fused generators
    (space-folded Menger + derived-carve DeathStar) + in-kernel analytic
    winner-gradient normals on the mega kernel.  Sharded forward must be
    bit-identical to single-device (per-ray arithmetic is shard-invariant
    and the block reorder is inverse-permuted), and the sharded gradients
    — the single-launch winner-Hessian backward with extended carve-winner
    ids, transposed through the mesh into the tail psum — must match the
    single-device gradients."""
    plan, tables = _fused_world()
    assert any(g.fused for g in plan.kernel.groups)
    mesh = make_mesh(4)
    cfg = CFG.replace(normal_mode="analytic", fused_generators=True)
    img = np.asarray(jax.jit(lambda t: render_sharded(
        plan, t, cfg, mesh, backend="mega", interpret=True))(tables))
    single = np.asarray(render_tables(plan, tables, cfg, backend="mega",
                                      interpret=True))
    np.testing.assert_array_equal(img, single)

    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    g_sharded = jax.jit(jax.grad(lambda t: mse_loss(
        plan, t, target, cfg, mesh, backend="mega",
        interpret=True)))(tables)

    def single_loss(t):
        out = render_tables(plan, t, cfg, backend="mega", interpret=True)
        return jnp.mean((out - target) ** 2)

    g_single = jax.grad(single_loss)(tables)
    for field in tables._fields:
        a = np.asarray(getattr(g_sharded, field), np.float64)
        b = np.asarray(getattr(g_single, field), np.float64)
        scale = max(np.abs(b).max(), 1e-8)
        # same per-ray terms, different reduction association (per-shard
        # partials + psum vs one segment-add) — f32 reassociation only
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-5 * scale,
            err_msg=f"sharded fused grad mismatch: {field}")


def test_hlo_single_tail_allreduce():
    """Compiled-HLO contract (docs/collectives.md): the production
    train_step has ZERO forward collectives, and XLA's combiner fuses every
    per-field gradient psum into ONE tuple all-reduce near the program
    tail."""
    plan, tables = _world()
    mesh = make_mesh(8)
    cfg = CFG.replace(normal_mode="analytic")
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    f = jax.jit(lambda t: train_step(plan, t, target, cfg, mesh, lr=0.01,
                                     backend="mega", interpret=True))
    txt = f.lower(tables).compile().as_text()
    lines = txt.splitlines()
    defs = [l for l in lines
            if ("all-reduce" in l and "=" in l
                and "get-tuple-element" not in l)]
    assert len(defs) == 1, f"expected one combined all-reduce, got {defs}"
    assert "all-gather" not in txt and "collective-permute" not in txt


def test_2d_mesh_hosts_by_chips():
    """Both axes of a (hosts, chips) mesh shard the ray axis."""
    from raymarching_tpu.parallel.sharded import make_mesh_2d

    plan, tables = _world()
    mesh = make_mesh_2d(2, 4)
    img = np.asarray(
        jax.jit(lambda t: render_sharded(plan, t, CFG, mesh))(tables))
    single = np.asarray(render_tables(plan, tables, CFG, backend="jnp"))
    np.testing.assert_allclose(img, single, atol=2e-5)

    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    loss, t2 = jax.jit(
        lambda t: train_step(plan, t, target, CFG, mesh, lr=0.01))(tables)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_sharded_fractal_train_step():
    """Procedural fractal leaves under shard_map: the full production
    train step (mega kernel, IFT backward, grad psum) on a scene mixing a
    Mandelbulb and a quaternion Julia runs on the 8-device mesh, produces
    a finite loss, and moves the fractal parameters."""
    from raymarching_tpu.scene.csg import Julia, Mandelbulb

    tree = ListNode(Mode.UNION, [
        bounds(60.0),
        Mandelbulb((0.0, 0.0, -6.0), 1.5, iterations=4,
                   color=(0.4, 0.7, 0.9)),
        Julia((3.0, 1.0, -8.0), 1.2, c=(-0.2, 0.6, 0.2, 0.2),
              iterations=5, color=(0.9, 0.5, 0.2)),
    ])
    plan, tables = compile_tree(tree, [Light((6.0, 8.0, 4.0))],
                                Camera(position=(0, 0, 6), fov=55.0))
    mesh = make_mesh(8)
    cfg = CFG.replace(shadows=False, ift_damping=3e-3)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    loss, new_tables = jax.jit(lambda t: train_step(
        plan, t, target, cfg, mesh, lr=0.01, backend="mega",
        interpret=True))(tables)
    assert np.isfinite(float(loss))
    moved = np.abs(np.asarray(new_tables.prim_pos)
                   - np.asarray(tables.prim_pos)).max()
    assert np.isfinite(moved) and moved > 0.0
