"""Mandelbox fractal primitive (scene-format extension).

The reference has no procedural SDFs (its whole leaf set is
sphere/box/cross, reference body.h:25-33); Mandelbox is the framework's
first post-parity model family.  Covered here:

  * scalar oracle (scene.csg.Mandelbox.sdf) vs the vectorized jnp field
    (core.sdf.mandelbox_sd) vs the kernel fold helper
    (ops.pallas_march._mandelbox_sd) — all three share the iteration's
    operation order, so agreement is to f32 roundoff;
  * the hand-derived forward-mode Jacobian (_mandelbox_sd_grad) against
    jax.grad of the jnp field;
  * parser/writer round-trip of the ``Mandelbox`` keyword;
  * plan compilation (structural (scale, iterations) in plan.proc, tagged
    kernel runs) and end-to-end backend agreement including CSG carves;
  * gradients through the IFT winner backward, incl. the homogeneity-based
    size cotangent (theta_cotangents sd/p columns), vs the autodiff oracle
    and finite differences.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from raymarching_tpu import RenderConfig
from raymarching_tpu.api import render_tables
from raymarching_tpu.core.sdf import mandelbox_sd, scene_sd
from raymarching_tpu.ops import pallas_march as pm
from raymarching_tpu.scene.compile import compile_tree
from raymarching_tpu.scene.csg import (ListNode, Mandelbox, Mode, Sphere,
                                       bounds)
from raymarching_tpu.scene.objects import Camera, Light
from raymarching_tpu.scene.parser import parse_scene
from raymarching_tpu.scene.writer import scene_to_text

MB = Mandelbox((0.5, -0.25, -6.0), 2.0, scale=2.0, iterations=6,
               color=(0.8, 0.5, 0.3))


def _points(n=256, seed=0, span=4.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-span, span, (n, 3)).astype(np.float32) \
        + np.asarray(MB.position, np.float32)


def test_scalar_oracle_matches_vectorized():
    pts = _points()
    vec = np.asarray(mandelbox_sd(jnp.asarray(pts),
                                  jnp.asarray(MB.position, jnp.float32),
                                  jnp.float32(MB.size),
                                  MB.scale, MB.iterations))
    for k in range(0, len(pts), 17):
        scalar = MB.sdf(tuple(float(v) for v in pts[k]))
        assert vec[k] == pytest.approx(scalar, rel=1e-5, abs=1e-5)


def _kernel_tbl():
    tbl = np.zeros((1, 6), np.float32)
    tbl[0, :3] = MB.position
    tbl[0, 3] = MB.size
    return jnp.asarray(tbl)


def test_kernel_field_matches_jnp():
    pts = jnp.asarray(_points(seed=1))
    want = mandelbox_sd(pts, jnp.asarray(MB.position, jnp.float32),
                        jnp.float32(MB.size), MB.scale, MB.iterations)
    got = pm._mandelbox_sd(_kernel_tbl(), 0, pts[:, 0], pts[:, 1],
                           pts[:, 2], MB.scale, MB.iterations)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_kernel_grad_matches_autodiff():
    """Hand-derived forward-mode Jacobian sweep vs jax.grad of the jnp
    field.  Fold-branch boundaries are measure zero; points that land
    within 1e-3 of one are excluded (both sides are 'correct' there)."""
    pts = jnp.asarray(_points(n=512, seed=2))
    sd, gx, gy, gz = pm._mandelbox_sd_grad(
        _kernel_tbl(), 0, pts[:, 0], pts[:, 1], pts[:, 2],
        MB.scale, MB.iterations)

    f = lambda p: mandelbox_sd(p, jnp.asarray(MB.position, jnp.float32),
                               jnp.float32(MB.size), MB.scale,
                               MB.iterations)
    sd_ad, g_ad = jax.vmap(jax.value_and_grad(f))(pts)

    np.testing.assert_allclose(np.asarray(sd), np.asarray(sd_ad),
                               rtol=1e-6, atol=1e-6)
    g = np.stack([np.asarray(gx), np.asarray(gy), np.asarray(gz)], axis=-1)
    g_ad = np.asarray(g_ad)
    # exclude rays whose fold iterates graze a branch boundary
    stable = np.abs(g - g_ad).max(axis=-1) < 1e-3
    assert stable.mean() > 0.95          # boundaries really are rare
    np.testing.assert_allclose(g[stable], g_ad[stable],
                               rtol=1e-4, atol=1e-4)


def test_parser_writer_roundtrip():
    text = ("Camera 0 0 6 0 0 -1 0 1 0\n"
            "Camera FOV 55\n"
            "Light 6 8 4\n"
            "Color 0.8 0.5 0.3\n"
            "Mandelbox 0.5 -0.25 -6 2 2 6\n"
            "Sphere 4 0 -6 1.5\n")
    scene = parse_scene(text)
    mb = scene.tree.children[0]
    assert isinstance(mb, Mandelbox)
    assert mb.position == (0.5, -0.25, -6.0)
    assert mb.size == 2.0 and mb.scale == 2.0 and mb.iterations == 6
    assert mb.color == (0.8, 0.5, 0.3)

    again = parse_scene(scene_to_text(scene))
    mb2 = again.tree.children[0]
    assert isinstance(mb2, Mandelbox)
    assert mb2.position == mb.position and mb2.size == mb.size
    assert mb2.scale == mb.scale and mb2.iterations == mb.iterations
    assert mb2.color == mb.color


def test_parser_defaults():
    scene = parse_scene("Mandelbox 0 0 -6 2\n")
    mb = scene.tree.children[0]
    assert mb.scale == 2.0 and mb.iterations == 8


def _world(mode=Mode.UNION):
    children = [
        bounds(60.0),
        MB,
        Sphere((4.0, 0.0, -6.0), 1.5, color=(0.3, 0.8, 0.4)),
    ]
    if mode == Mode.DIFFERENCE:
        # carve the fractal OUT of a sphere: Mandelbox in a max-group
        children = [
            bounds(60.0),
            ListNode(Mode.DIFFERENCE,
                     [Sphere((0.5, -0.25, -6.0), 2.2, color=(0.9, 0.4, 0.2)),
                      MB]),
            Sphere((4.0, 0.0, -6.0), 1.5, color=(0.3, 0.8, 0.4)),
        ]
    tree = ListNode(Mode.UNION, children)
    return compile_tree(tree, [Light((6.0, 8.0, 4.0))],
                        Camera(position=(0, 0, 6), fov=55.0))


def test_compile_plan_records_structure():
    plan, tables = _world()
    assert plan.proc, "Mandelbox leaves must be recorded in plan.proc"
    (leaf, kind, mscale, miters), = plan.proc
    assert kind == "mb"
    assert (mscale, miters) == (2.0, 6)
    assert plan.kernel is not None, "depth<=2 scene must keep the fast path"
    assert plan.kernel.proc == plan.proc
    # the leaf sits in a tagged run that cannot merge with dense types
    tagged = [r for g in plan.kernel.groups for r in g.runs
              if isinstance(r[0], tuple)]
    assert tagged and tagged[0][0] == ("mb", 2.0, 6)
    assert float(tables.prim_aux[leaf, 0]) == MB.size


CFG = RenderConfig(width=20, height=14, ssaa=1, iterations=120,
                   shadows=True, normal_mode="fd")


@pytest.mark.parametrize("mode", [Mode.UNION, Mode.DIFFERENCE])
def test_backends_agree(mode):
    # atol 1e-3: marching a fractal amplifies f32 reassociation drift
    # between XLA-CPU and the interpret-mode kernel (a few 1e-4 on ~2% of
    # pixels on the carve scene); semantic divergence would be >=1e-2.
    plan, tables = _world(mode)
    ref = np.asarray(render_tables(plan, tables, CFG, backend="ref"))
    jnp_img = np.asarray(render_tables(plan, tables, CFG, backend="jnp"))
    pl = np.asarray(render_tables(plan, tables, CFG, backend="pallas",
                                  interpret=True))
    mega = np.asarray(render_tables(plan, tables, CFG, backend="mega",
                                    interpret=True))
    np.testing.assert_allclose(jnp_img, ref, atol=1e-3)
    np.testing.assert_allclose(pl, ref, atol=1e-3)
    np.testing.assert_allclose(mega, ref, atol=1e-3)
    assert ref.std() > 0.01              # the fractal is actually visible


def test_scene_sd_marches_safely():
    """The DE must be a non-negative underestimate along rays: stepping by
    it from outside never lands strictly inside (sd >= 0 everywhere on the
    sphere-trace trajectory is what keeps the march convergent)."""
    plan, tables = _world()
    pts = jnp.asarray(_points(n=512, seed=3, span=6.0))
    sd = np.asarray(mandelbox_sd(pts, jnp.asarray(MB.position, jnp.float32),
                                 jnp.float32(MB.size), MB.scale,
                                 MB.iterations))
    assert np.all(sd >= 0.0)
    assert np.all(np.isfinite(np.asarray(scene_sd(plan, tables, pts))))


def _loss(plan, tables, cfg, backend, interpret=False):
    img = render_tables(plan, tables, cfg, backend=backend,
                        interpret=interpret, differentiable=True)
    return jnp.mean(img * img)


GCFG = CFG.replace(shadows=False, normal_mode="analytic")


@pytest.fixture(scope="module")
def grad_pair():
    # NOTE: no unrolled-autodiff ("ref") cross-check at render level — on a
    # fractal the unrolled march recursion delta-t_{n+1} = (1 + grad f . d)
    # delta-t_n + delta-f transiently amplifies (|1 + grad f . d| > 1 on
    # wild DE steps) and the oracle gradient blows up by ~1e6 while the IFT
    # route stays at the fixed-point answer; the stable estimator is
    # validated exactly at fixed points below (same precedent as
    # test_grad.test_config4_camera_pose_gradients_menger).
    plan, tables = _world()
    g_ift = jax.grad(lambda t: _loss(plan, t, GCFG, "jnp"))(tables)
    return plan, tables, g_ift


def test_ift_grads_finite_with_signal(grad_pair):
    plan, _, g_ift = grad_pair
    (leaf, _, _, _), = plan.proc
    flat, _ = jax.flatten_util.ravel_pytree(g_ift)
    assert np.all(np.isfinite(np.asarray(flat)))
    assert np.abs(np.asarray(g_ift.prim_pos)[leaf]).max() > 1e-6
    assert np.abs(np.asarray(g_ift.prim_aux)[leaf, 0]) > 1e-6
    assert np.abs(np.asarray(g_ift.prim_color)[leaf]).max() > 1e-6


def test_winner_backward_matches_autodiff_at_fixed_points():
    """The whole new backward plumbing — winner kernel + theta_cotangents
    with the homogeneity sd/p columns — vs jax.grad of u . scene_sd(tables,
    p) at FIXED query points (no march dynamics, ties measure-zero)."""
    from raymarching_tpu.ops.scene_vjp import theta_cotangents, winner_eval

    plan, tables = _world()
    p = jnp.asarray(_points(n=256, seed=5, span=5.0))
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.uniform(-1.0, 1.0, p.shape[0]).astype(np.float32))

    sd, widx, g = winner_eval(plan, GCFG, p, tables, True)
    got = theta_cotangents(plan, tables, widx, g, u, sd=sd, p=p)

    want = jax.grad(
        lambda t: jnp.sum(u * scene_sd(plan, t, p)))(tables)
    for field in ("prim_pos", "prim_aux"):
        a = np.asarray(getattr(got, field), np.float64)
        b = np.asarray(getattr(want, field), np.float64)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-4 * scale,
                                   err_msg=f"mismatch in {field}")


def test_size_homogeneity_identity():
    """d DE/d size from the homogeneity formula (what theta_cotangents
    computes from per-ray sd/g/p) against autodiff of the field itself."""
    pts = jnp.asarray(_points(n=256, seed=7))
    c = jnp.asarray(MB.position, jnp.float32)

    def f(p, s):
        return mandelbox_sd(p, c, s, MB.scale, MB.iterations)

    s0 = jnp.float32(MB.size)
    sd, g = jax.vmap(jax.value_and_grad(lambda p: f(p, s0)))(pts)
    formula = (sd - jnp.sum(g * (pts - c), axis=-1)) / s0
    want = jax.vmap(jax.grad(lambda s, p: f(p, s)), in_axes=(None, 0))(
        s0, pts)
    np.testing.assert_allclose(np.asarray(formula), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_native_parser_parity():
    """The C++ parser twin handles the Mandelbox extension keyword: same
    tables as the Python compiler, structural (scale, iterations) split
    back out of the aux slots into plan-static form."""
    from raymarching_tpu import compile_scene
    from raymarching_tpu.native import available, native_parse_scene

    if not available():
        pytest.skip("native library not built")
    text = ("Color 0.8 0.5 0.3\n"
            "Mandelbox 0.5 -0.25 -6 2 2 6\n"
            "Mandelbox 1 2 -8 1.5\n"      # defaults: scale 2, iterations 8
            "Sphere 4 0 -6 1.5\n"
            "Light 6 8 4\n")
    res = native_parse_scene(text)
    plan, tables = compile_scene(parse_scene(text))
    np.testing.assert_array_equal(res["prim_type"],
                                  np.asarray(plan.prim_type, np.int32))
    np.testing.assert_allclose(res["prim_pos"], tables.prim_pos, atol=0)
    np.testing.assert_allclose(res["prim_aux"], tables.prim_aux, atol=0)
    np.testing.assert_allclose(res["prim_color"], tables.prim_color, atol=0)
    assert res["proc"] == plan.proc == ((0, "mb", 2.0, 6),
                                        (1, "mb", 2.0, 8))


@pytest.mark.slow
def test_mega_grads_match_jnp():
    plan, tables = _world()
    gm = jax.grad(lambda t: _loss(plan, t, GCFG, "mega", True))(tables)
    gj = jax.grad(lambda t: _loss(plan, t, GCFG, "jnp"))(tables)
    for field in ("prim_pos", "prim_aux", "prim_color"):
        a = np.asarray(getattr(gm, field), np.float64)
        b = np.asarray(getattr(gj, field), np.float64)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a, b, rtol=0.05, atol=0.01 * scale,
                                   err_msg=f"mega gradient mismatch in "
                                           f"{field}")


@pytest.mark.slow
def test_default_config_grads_finite_through_fixed_point():
    """Regression: an axis-aligned camera ray marches INTO the fold's fixed
    point (the Mandelbox's own position, where the iterated q — and hence
    the winner gradient — is exactly 0).  Three separate inf*0=NaN sites
    poisoned the full gradient pytree before the 1e-24 sqrt floors
    (core.sdf.mandelbox_sd / leaf_sd sphere column / shading.normalize):
    the default shadows+FD config must return finite grads anyway."""
    tree = ListNode(Mode.UNION, [
        Mandelbox((0.0, 0.0, 0.0), 1.0, scale=2.0, iterations=8,
                  color=(0.85, 0.55, 0.3)),
    ])
    plan, tables = compile_tree(
        tree, [Light((10.0, 14.0, 12.0))],
        Camera(position=(0.0, 2.0, 16.0), direction=(0.0, -0.12, -1.0),
               fov=60.0))
    cfg = RenderConfig(width=16, height=12, ssaa=1, iterations=150,
                       shadows=True, normal_mode="fd")
    g = jax.grad(lambda t: _loss(plan, t, cfg, "jnp"))(tables)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.all(np.isfinite(np.asarray(flat)))
