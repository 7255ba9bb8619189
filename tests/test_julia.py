"""Quaternion Julia-set primitive (scene-format extension).

Third procedural model family (after [[test_mandelbox]] and
[[test_mandelbulb]]; the reference has no procedural SDFs, reference
body.h:25-33).  The Julia constant c is the first STRUCTURAL TUPLE param
to ride the kind-tagged plan.proc plumbing (and, natively, the first user
of the prim_extra ABI lane) — the tests here pin that plumbing plus the
usual oracle/kernel/gradient/backend agreement.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from raymarching_tpu import RenderConfig
from raymarching_tpu.api import render_tables
from raymarching_tpu.core.sdf import julia_sd, scene_sd
from raymarching_tpu.ops import pallas_march as pm
from raymarching_tpu.scene.compile import compile_tree
from raymarching_tpu.scene.csg import (Julia, ListNode, Mode, Sphere,
                                       bounds)
from raymarching_tpu.scene.objects import Camera, Light
from raymarching_tpu.scene.parser import parse_scene
from raymarching_tpu.scene.writer import scene_to_text

J = Julia((0.1, -0.2, -4.0), 1.2, c=(-0.2, 0.6, 0.2, 0.2), iterations=9,
          color=(0.9, 0.6, 0.3))


def _points(n=256, seed=0, span=3.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-span, span, (n, 3)).astype(np.float32) \
        + np.asarray(J.position, np.float32)


def test_scalar_oracle_matches_vectorized():
    pts = _points()
    vec = np.asarray(julia_sd(jnp.asarray(pts),
                              jnp.asarray(J.position, jnp.float32),
                              jnp.float32(J.size), J.c, J.iterations))
    for k in range(0, len(pts), 17):
        scalar = J.sdf(tuple(float(v) for v in pts[k]))
        assert vec[k] == pytest.approx(scalar, rel=1e-4, abs=1e-4)


def _kernel_tbl():
    tbl = np.zeros((1, 6), np.float32)
    tbl[0, :3] = J.position
    tbl[0, 3] = J.size
    return jnp.asarray(tbl)


def test_kernel_field_matches_jnp():
    pts = _points(seed=1)
    tbl = _kernel_tbl()
    px, py, pz = (jnp.asarray(pts[:, a]) for a in range(3))
    got = np.asarray(pm._julia_sd(tbl, 0, px, py, pz, J.c, J.iterations))
    want = np.asarray(julia_sd(jnp.asarray(pts), tbl[0, :3], tbl[0, 3],
                               J.c, J.iterations))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_kernel_grad_matches_autodiff():
    pts = _points(seed=2)
    tbl = _kernel_tbl()
    px, py, pz = (jnp.asarray(pts[:, a]) for a in range(3))
    sd, gx, gy, gz = pm._julia_sd_grad(tbl, 0, px, py, pz, J.c,
                                       J.iterations)
    f = lambda q: julia_sd(q[None], tbl[0, :3], tbl[0, 3], J.c,
                           J.iterations)[0]
    gref = np.asarray(jax.vmap(jax.grad(f))(jnp.asarray(pts)))
    got = np.stack([np.asarray(gx), np.asarray(gy), np.asarray(gz)], -1)
    np.testing.assert_allclose(got, gref, rtol=2e-3, atol=2e-3)


def test_center_fixed_point_finite():
    """p at the prim position with c = 0: z stays at the origin fixed
    point (m = 0 every step) — values and gradients must stay finite
    through the sqrt/log floors on every path."""
    z = Julia((1.0, 2.0, 3.0), 1.0, c=(0.0, 0.0, 0.0, 0.0), iterations=8)
    pts = np.array([[1.0, 2.0, 3.0], [1.0, 2.0, 3.5]], np.float32)
    f = lambda q: julia_sd(q[None], jnp.asarray(z.position, jnp.float32),
                           jnp.float32(1.0), z.c, z.iterations)[0]
    vals = np.asarray(jax.vmap(f)(jnp.asarray(pts)))
    grads = np.asarray(jax.vmap(jax.grad(f))(jnp.asarray(pts)))
    assert np.isfinite(vals).all() and np.isfinite(grads).all()
    assert np.isfinite(z.sdf((1.0, 2.0, 3.0)))


def test_parser_writer_roundtrip():
    text = ("Camera 0 0 6 0 0 -1 0 1 0\n"
            "Camera FOV 55\n"
            "Light 6 8 4\n"
            "Color 0.9 0.6 0.3\n"
            "Julia 0.1 -0.2 -4 1.2 -0.2 0.6 0.2 0.2 9\n"
            "Julia 1 0 -6 0.5 0.3 0.5 0.4 0.1\n")
    sc = parse_scene(text)
    a, b = sc.tree.children
    assert isinstance(a, Julia) and a.iterations == 9
    assert a.c == pytest.approx((-0.2, 0.6, 0.2, 0.2))
    assert b.iterations == 11                        # default
    sc2 = parse_scene(scene_to_text(sc))
    assert sc2.tree.children[0] == a
    assert sc2.tree.children[1] == b


def _world(mode=Mode.UNION):
    children = [
        bounds(60.0),
        J,
        Sphere((3.0, 0.0, -4.0), 0.8, color=(0.3, 0.8, 0.4)),
    ]
    if mode == Mode.DIFFERENCE:
        children = [
            bounds(60.0),
            ListNode(Mode.DIFFERENCE,
                     [Sphere((0.1, -0.2, -4.0), 1.3,
                             color=(0.9, 0.4, 0.2)), J]),
            Sphere((3.0, 0.0, -4.0), 0.8, color=(0.3, 0.8, 0.4)),
        ]
    tree = ListNode(Mode.UNION, children)
    return compile_tree(tree, [Light((6.0, 8.0, 4.0))],
                        Camera(position=(0, 0.3, 3), fov=55.0))


def test_compile_plan_records_structure():
    plan, tables = _world()
    (leaf, kind, const, iters), = plan.proc
    assert kind == "julia" and iters == 9
    assert const == pytest.approx((-0.2, 0.6, 0.2, 0.2))
    assert plan.kernel is not None
    tagged = [r for g in plan.kernel.groups for r in g.runs
              if isinstance(r[0], tuple)]
    assert tagged and tagged[0][0][0] == "julia"
    assert float(tables.prim_aux[leaf, 0]) == pytest.approx(J.size)


CFG = RenderConfig(width=24, height=16, ssaa=1, iterations=150,
                   shadows=True, normal_mode="fd")


@pytest.mark.parametrize("mode", [Mode.UNION, Mode.DIFFERENCE])
def test_backends_agree(mode):
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
    assert ref.std() > 0.01


def _loss(plan, tables, cfg, backend, interpret=False):
    img = render_tables(plan, tables, cfg, backend=backend,
                        interpret=interpret, differentiable=True)
    return jnp.mean(img * img)


GCFG = CFG.replace(shadows=False, normal_mode="analytic")


def test_ift_grads_finite_with_signal():
    plan, tables = _world()
    g_ift = jax.grad(lambda t: _loss(plan, t, GCFG, "jnp"))(tables)
    (leaf, _, _, _), = plan.proc
    flat, _ = jax.flatten_util.ravel_pytree(g_ift)
    assert np.all(np.isfinite(np.asarray(flat)))
    assert np.abs(np.asarray(g_ift.prim_pos)[leaf]).max() > 1e-6
    assert np.abs(np.asarray(g_ift.prim_aux)[leaf, 0]) > 1e-6


def test_winner_backward_matches_autodiff_at_fixed_points():
    from raymarching_tpu.ops.scene_vjp import theta_cotangents, winner_eval

    plan, tables = _world()
    p = jnp.asarray(_points(n=256, seed=5, span=4.0))
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
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3 * scale,
                                   err_msg=f"mismatch in {field}")


def test_native_parser_parity():
    """The C++ twin parses Julia: the 4-float constant crosses the ABI in
    the prim_extra lane and lands bit-equal in plan.proc (csg._f32
    canonicalizes the Python side to f32)."""
    from raymarching_tpu import compile_scene
    from raymarching_tpu.native import available, native_parse_scene

    if not available():
        pytest.skip("native library not built")
    text = ("Color 0.9 0.6 0.3\n"
            "Julia 0.1 -0.2 -4 1.2 -0.2 0.6 0.2 0.2 9\n"
            "Julia 1 0 -6 0.5 0.3 0.5 0.4 0.1\n"
            "Mandelbulb 0 2 -8 0.75\n"
            "Sphere 4 0 -6 1.2\n"
            "Light 6 8 4\n")
    res = native_parse_scene(text)
    plan, tables = compile_scene(parse_scene(text))
    np.testing.assert_array_equal(res["prim_type"],
                                  np.asarray(plan.prim_type, np.int32))
    np.testing.assert_allclose(res["prim_aux"], tables.prim_aux, atol=0)
    assert res["proc"] == plan.proc
    assert [k for (_, k, _, _) in plan.proc] == ["julia", "julia", "bulb"]
