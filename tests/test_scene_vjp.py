"""Winner-kernel backward (ops.scene_vjp) vs the jnp jax.vjp route.

The exact-table backward replaces ``jax.vjp(scene_sd)`` (which transposes
the [rays, prims] leaf matrix) with one combined kernel pass returning
(sd, winner, winner-gradient) plus per-lane cotangent formulas and a
segment-sum.  These tests pin that algebra, field by field, against the
jnp route.

Ties are handled explicitly: coincident faces make CSG fields tie over
OPEN regions (see the ops.scene_vjp module docstring), where the kernel
awards the whole cotangent to the first minimal leaf (reference binary-
fold autodiff semantics) while jnp's reduce-min transpose splits evenly.
Direct comparisons therefore mask tied lanes and separately assert sum
conservation over the full table with ties included."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raymarching_tpu import RenderConfig
from raymarching_tpu.core import shading
from raymarching_tpu.core.march import march_while
from raymarching_tpu.core.sdf import scene_sd
from raymarching_tpu.ops import march_op as mo
from raymarching_tpu.ops.scene_vjp import (fd_normal_bwd, make_march_bwd,
                                           theta_cotangents, winner_eval)
from raymarching_tpu.scene.compile import compile_tree
from raymarching_tpu.scene.csg import Box, Cross, ListNode, Mode, Sphere, \
    bounds
from raymarching_tpu.scene.generators import menger_sponge
from raymarching_tpu.scene.objects import Camera, Light

CFG = RenderConfig(width=16, height=16, ssaa=1, iterations=60,
                   shadows=False, normal_mode="fd")


def _world():
    tree = ListNode(Mode.UNION, [
        bounds(60.0),
        Sphere((0.0, 0.5, -6.0), 2.1, color=(0.9, 0.4, 0.2)),
        Box((4.0, -1.0, -7.0), (2.0, 3.0, 1.5), color=(0.2, 0.9, 0.4)),
        Cross((-4.0, 1.0, -8.0), (3.0, 3.0, 3.0), color=(0.4, 0.4, 0.9)),
        menger_sponge((0.0, -4.0, -9.0), 5.0, 2, color=(0.9, 0.9, 0.8)),
    ])
    return compile_tree(tree, [Light((6.0, 8.0, 4.0))],
                        Camera(position=(0, 0, 6), fov=60.0))


def _points(n=257, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.uniform([-7, -6, -12], [7, 4, -3], (n, 3)).astype(np.float32))


def _tie_free(plan, tables, p, eps=1e-5):
    """Lanes where exactly one leaf attains the scene value (|scene sd| ==
    |winner leaf sd| always; >1 close leaf = a potential tie)."""
    from raymarching_tpu.core.sdf import leaf_sd

    ls = leaf_sd(plan, jax.tree_util.tree_map(jnp.asarray, tables), p)
    sd = scene_sd(plan, tables, p)
    close = jnp.abs(jnp.abs(ls) - jnp.abs(sd)[..., None]) < eps
    return jnp.sum(close, axis=-1) <= 1


def _tables_close(a, b, rtol=2e-4, atol=None):
    for field in ("prim_pos", "prim_aux", "prim_color", "light_pos"):
        x = np.asarray(getattr(a, field), np.float64)
        y = np.asarray(getattr(b, field), np.float64)
        tol = atol if atol is not None else 1e-5 * max(np.abs(y).max(), 1.0)
        np.testing.assert_allclose(
            x, y, rtol=rtol, atol=tol, err_msg=f"mismatch in {field}")


def test_winner_eval_matches_jnp_grad():
    plan, tables = _world()
    p = _points()
    sd, widx, g = winner_eval(plan, CFG, p, tables, True)
    sd_j = scene_sd(plan, tables, p)
    np.testing.assert_allclose(np.asarray(sd), np.asarray(sd_j), atol=1e-5)
    g_j = shading.normal_analytic(lambda q: scene_sd(plan, tables, q), p)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_j), atol=1e-5)


def test_theta_cotangents_match_jnp_vjp_off_ties():
    plan, tables = _world()
    p = _points(seed=1)
    u_all = jnp.asarray(np.random.default_rng(2).normal(
        size=p.shape[0]).astype(np.float32))
    clean = _tie_free(plan, tables, p)
    assert 0.5 < float(clean.mean()) < 1.0   # ties exist AND most are clean
    u = jnp.where(clean, u_all, 0.0)

    _, widx, g = winner_eval(plan, CFG, p, tables, True)
    ours = theta_cotangents(plan, tables, widx, g, u)

    _, vjp = jax.vjp(lambda tb: scene_sd(plan, tb, p), tables)
    (ref,) = vjp(u)
    _tables_close(ours, ref)


def test_theta_cotangents_sum_conserved_on_ties():
    """Ties redistribute within a tie class (identical fields -> identical
    per-leaf derivatives), so full-table sums agree with ties included."""
    plan, tables = _world()
    p = _points(seed=1)
    u = jnp.asarray(np.random.default_rng(2).normal(
        size=p.shape[0]).astype(np.float32))

    _, widx, g = winner_eval(plan, CFG, p, tables, True)
    ours = theta_cotangents(plan, tables, widx, g, u)
    _, vjp = jax.vjp(lambda tb: scene_sd(plan, tb, p), tables)
    (ref,) = vjp(u)
    for field in ("prim_pos", "prim_aux"):
        a = np.asarray(getattr(ours, field), np.float64).sum(axis=0)
        b = np.asarray(getattr(ref, field), np.float64).sum(axis=0)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_march_bwd_matches_jnp_route():
    plan, tables = _world()
    rng = np.random.default_rng(3)
    n = 129
    o = jnp.asarray(np.broadcast_to([0.0, 0.0, 6.0], (n, 3))
                    .astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] -= 2.0   # bias toward the scene
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    res = march_while(lambda q: scene_sd(plan, tables, q), o, d,
                      CFG.iterations, CFG.surface_precision)
    t = jnp.sum((res.position - o) * d, axis=-1)
    residuals = (res.position, res.converged, t, d, tables)
    clean = _tie_free(plan, tables, res.position)[..., None]
    cot = type(res)(position=jnp.where(clean, jnp.asarray(
        rng.normal(size=(n, 3)).astype(np.float32)), 0.0),
        sd=jnp.zeros(n), converged=jnp.zeros(n, bool))

    ours = make_march_bwd(plan, CFG, True)(residuals, cot)
    ref = mo._march_bwd(lambda tb, q: scene_sd(plan, tb, q),
                        CFG.iterations, CFG.surface_precision, None, None,
                        0.0, residuals, cot)
    np.testing.assert_allclose(np.asarray(ours[0]), np.asarray(ref[0]),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours[1]), np.asarray(ref[1]),
                               rtol=2e-4, atol=1e-5)
    _tables_close(ours[2], ref[2])


def test_fd_normal_bwd_matches_jnp_vjp():
    plan, tables = _world()
    p = _points(seed=4)
    # mask lanes where ANY of the 6 stencil points sits on a tie
    h = CFG.fd_h
    clean = _tie_free(plan, tables, p)
    for a in range(3):
        for s in (1.0, -1.0):
            q = p + s * h * jnp.eye(3, dtype=p.dtype)[a]
            clean = jnp.logical_and(clean, _tie_free(plan, tables, q))
    nbar = jnp.where(clean[..., None], jnp.asarray(
        np.random.default_rng(5).normal(size=p.shape).astype(np.float32)),
        0.0)

    p_ours, t_ours = fd_normal_bwd(plan, CFG, True, p, tables, nbar)

    def est(p_, tb):
        return shading.normal_fd(lambda q: scene_sd(plan, tb, q),
                                 p_, CFG.fd_h)

    _, vjp = jax.vjp(est, p, tables)
    p_ref, t_ref = vjp(nbar)
    # stencil cotangents are O(nbar/2h) ~ 500, and +h/-h contributions
    # cancel, so f32 summation-order noise shows at ~1e-3 absolute (the
    # batched single scatter interleaves the rows the six per-point
    # scatters used to sum separately — ~5e-6 relative to the canceling
    # terms)
    np.testing.assert_allclose(np.asarray(p_ours), np.asarray(p_ref),
                               rtol=2e-3, atol=5e-3)
    _tables_close(t_ours, t_ref, rtol=2e-3, atol=5e-3)


def test_analytic_normal_bwd_matches_jnp_vjp():
    """The closed-form winner-Hessian backward (sphere curvature, flat
    box/cross) against jax's reverse-over-reverse through the jnp field."""
    from raymarching_tpu.ops.scene_vjp import analytic_normal_bwd

    plan, tables = _world()
    p = _points(seed=6)
    clean = _tie_free(plan, tables, p)
    gbar = jnp.where(clean[..., None], jnp.asarray(
        np.random.default_rng(7).normal(size=p.shape).astype(np.float32)),
        0.0)

    cfg = CFG.replace(normal_mode="analytic")
    p_ours, t_ours = analytic_normal_bwd(plan, cfg, True, p, tables, gbar)

    def est(p_, tb):
        return shading.normal_analytic(lambda q: scene_sd(plan, tb, q), p_)

    _, vjp = jax.vjp(est, p, tables)
    p_ref, t_ref = vjp(gbar)
    np.testing.assert_allclose(np.asarray(p_ours), np.asarray(p_ref),
                               rtol=2e-3, atol=2e-3)
    _tables_close(t_ours, t_ref, rtol=2e-3, atol=2e-3)
    # flat winners (box/cross) and radii must carry ZERO normal cotangent
    assert float(jnp.abs(t_ours.prim_aux).max()) == 0.0


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["pallas", "mega"])
def test_end_to_end_analytic_grads_match_jnp(backend):
    """Full render gradcheck on the exact+analytic path: the single-launch
    winner-Hessian backward must reproduce the jnp backend's gradients
    (same estimator, replayed through the jnp field)."""
    plan, tables = _world()
    from raymarching_tpu.api import render_tables
    cfg = CFG.replace(shadows=True, normal_mode="analytic")

    def loss(t, backend, interpret=False):
        img = render_tables(plan, t, cfg, backend=backend,
                            interpret=interpret, differentiable=True)
        return jnp.mean(img * img)

    gk = jax.grad(lambda t: loss(t, backend, True))(tables)
    gj = jax.grad(lambda t: loss(t, "jnp"))(tables)
    # atol 0.02*scale (vs the FD test's 0.005): a couple of lanes land on
    # CSG tie sets where kernel first-wins vs jnp even-split subgradients
    # lawfully differ; verified the winner-Hessian route matches the jnp
    # REPLAY route (same estimator, same tie choice) to 5e-10 on this
    # exact world — the residual here is backend tie semantics, not the
    # closed-form chain.
    for field in ("prim_pos", "prim_aux", "prim_color", "light_pos",
                  "cam_position", "cam_direction", "cam_up", "cam_fov"):
        a = np.asarray(getattr(gk, field), np.float64)
        b = np.asarray(getattr(gj, field), np.float64)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a, b, rtol=0.02, atol=0.02 * scale,
            err_msg=f"{backend} analytic-backward mismatch in {field}")


@pytest.mark.slow
def test_end_to_end_fused_analytic_grads_match_jnp():
    """The single-launch fused winner backward (extended carve-winner ids,
    translation/homogeneity theta algebra, derived-centre Hessian) against
    the jnp backend differentiating the same folded field.  The world
    exercises every winner kind: dense sphere/box/cross, a DeathStar
    (curved derived carve), and a Menger group (flat folded carve)."""
    from raymarching_tpu.scene.generators import death_star

    tree = ListNode(Mode.UNION, [
        bounds(60.0),
        Sphere((0.0, 0.5, -6.0), 2.1, color=(0.9, 0.4, 0.2)),
        Box((4.0, -1.0, -7.0), (2.0, 3.0, 1.5), color=(0.2, 0.9, 0.4)),
        death_star((-3.5, 0.5, -6.5), 1.8, color=(0.3, 0.4, 0.9)),
        menger_sponge((0.0, -4.0, -9.0), 5.0, 2, color=(0.9, 0.9, 0.8)),
    ])
    plan, tables = compile_tree(tree, [Light((6.0, 8.0, 4.0))],
                                Camera(position=(0, 0, 6), fov=60.0))
    from raymarching_tpu.api import render_tables
    cfg = CFG.replace(shadows=True, fused_generators=True,
                      normal_mode="analytic")

    def loss(t, backend, interpret=False):
        img = render_tables(plan, t, cfg, backend=backend,
                            interpret=interpret, differentiable=True)
        return jnp.mean(img * img)

    gk = jax.grad(lambda t: loss(t, "mega", True))(tables)
    gj = jax.grad(lambda t: loss(t, "jnp"))(tables)
    # tie-set tolerance as in the exact analytic test; the kernel route
    # was verified against the jnp REPLAY route to 1e-9 on this world.
    # prim_color: the kernel awards a fused group's color cotangent to its
    # BASE row (the generator has one color in the grammar; the image is
    # identical), the jnp backend to individual leaf rows — compare the
    # per-group SUM there and elementwise outside generator rows.
    gen_rows = [list(range(g.start, g.start + g.count))
                for g in plan.kernel.groups if g.fused is not None]
    for field in ("prim_pos", "prim_aux", "prim_color", "light_pos",
                  "cam_position", "cam_direction", "cam_up", "cam_fov"):
        a = np.asarray(getattr(gk, field), np.float64)
        b = np.asarray(getattr(gj, field), np.float64)
        scale = max(np.abs(b).max(), 1e-8)
        if field == "prim_color":
            keep = np.ones(len(a), bool)
            for rows in gen_rows:
                np.testing.assert_allclose(
                    a[rows].sum(0), b[rows].sum(0), rtol=0.02,
                    atol=0.02 * scale,
                    err_msg="fused group color-cotangent sum mismatch")
                keep[rows] = False
            a, b = a[keep], b[keep]
        np.testing.assert_allclose(
            a, b, rtol=0.02, atol=0.02 * scale,
            err_msg=f"fused-analytic backward mismatch in {field}")


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["pallas", "mega"])
def test_end_to_end_fd_grads_match_jnp(backend):
    """Full render gradcheck on the FD path: the kernel backward must
    reproduce the jnp backend's gradients (which test_grad.py pins against
    the unrolled-scan oracle)."""
    plan, tables = _world()
    from raymarching_tpu.api import render_tables
    cfg = CFG.replace(shadows=True)

    def loss(t, backend, interpret=False):
        img = render_tables(plan, t, cfg, backend=backend,
                            interpret=interpret, differentiable=True)
        return jnp.mean(img * img)

    gk = jax.grad(lambda t: loss(t, backend, True))(tables)
    gj = jax.grad(lambda t: loss(t, "jnp"))(tables)
    for field in ("prim_pos", "prim_aux", "prim_color", "light_pos",
                  "cam_position", "cam_direction", "cam_up", "cam_fov"):
        a = np.asarray(getattr(gk, field), np.float64)
        b = np.asarray(getattr(gj, field), np.float64)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a, b, rtol=0.02, atol=0.005 * scale,
            err_msg=f"{backend} kernel-backward mismatch in {field}")


def test_wide_table_gather_segment_parity():
    """The P-aware dispatch in _gather_rows/_segment_add (r5,
    _ONEHOT_MAX_K): beyond ~3k rows they switch from the one-hot MXU
    formulation to a plain take / XLA scatter-add.  Pin both branches
    against each other — values identical (gather) / to summation-order
    ulps (segment), and negative (miss) indices drop in both."""
    import jax.numpy as jnp

    from raymarching_tpu.ops import scene_vjp as sv

    rng = np.random.default_rng(5)
    P, R, C = 5000, 9000, 5
    assert P > sv._ONEHOT_MAX_K
    idx = jnp.asarray(rng.integers(-1, P, R).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
    mat = jnp.asarray(rng.standard_normal((P, 3)).astype(np.float32))

    wide_g = np.asarray(sv._gather_rows(idx, mat))
    wide_s = np.asarray(sv._segment_add(idx, vals, P))
    old = sv._ONEHOT_MAX_K
    sv._ONEHOT_MAX_K = 10 ** 9
    try:
        oh_g = np.asarray(sv._gather_rows(idx, mat))
        oh_s = np.asarray(sv._segment_add(idx, vals, P))
    finally:
        sv._ONEHOT_MAX_K = old
    np.testing.assert_array_equal(wide_g, oh_g)
    np.testing.assert_allclose(wide_s, oh_s, rtol=2e-6, atol=1e-6)
    miss = np.asarray(idx) < 0
    assert miss.any() and np.all(wide_g[miss] == 0.0)
