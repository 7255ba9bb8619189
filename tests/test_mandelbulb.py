"""Mandelbulb fractal primitive (scene-format extension).

Second procedural model family (after [[test_mandelbox]] — the reference
has no procedural SDFs, reference body.h:25-33).  Covered here:

  * scalar oracle (scene.csg.Mandelbulb.sdf, early-break escape) vs the
    vectorized jnp field (core.sdf.mandelbulb_sd, masked escape) vs the
    kernel fold helper (ops.pallas_march._mandelbulb_sd);
  * the _Jet forward-mode kernel gradient (_mandelbulb_sd_grad) against
    jax.grad of the jnp field;
  * parser/writer round-trip of the ``Mandelbulb`` keyword;
  * plan compilation (kind-tagged ("bulb", power, iters) runs in
    plan.proc) and end-to-end backend agreement including CSG carves;
  * gradients through the IFT winner backward (the homogeneity-based size
    cotangent applies to the bulb unchanged — the DE is signed, unlike
    Mandelbox's non-negative one, which exercises the negative-sd branch
    of theta_cotangents' sd column);
  * y-axis stability: the trig-free polynomial divides by the (x,z)-plane
    radius; the factored evaluation must stay finite (value and gradient)
    for points exactly ON the axis.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from raymarching_tpu import RenderConfig
from raymarching_tpu.api import render_tables
from raymarching_tpu.core.sdf import mandelbulb_sd, scene_sd
from raymarching_tpu.ops import pallas_march as pm
from raymarching_tpu.scene.compile import compile_tree
from raymarching_tpu.scene.csg import (ListNode, Mandelbulb, Mode, Sphere,
                                       bounds)
from raymarching_tpu.scene.objects import Camera, Light
from raymarching_tpu.scene.parser import parse_scene
from raymarching_tpu.scene.writer import scene_to_text

MB = Mandelbulb((0.25, -0.1, -5.0), 1.5, iterations=5,
                color=(0.4, 0.7, 0.9))


def _points(n=256, seed=0, span=4.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-span, span, (n, 3)).astype(np.float32) \
        + np.asarray(MB.position, np.float32)


def test_scalar_oracle_matches_vectorized():
    pts = _points()
    vec = np.asarray(mandelbulb_sd(jnp.asarray(pts),
                                   jnp.asarray(MB.position, jnp.float32),
                                   jnp.float32(MB.size),
                                   float(MB.power), MB.iterations))
    for k in range(0, len(pts), 17):
        scalar = MB.sdf(tuple(float(v) for v in pts[k]))
        assert vec[k] == pytest.approx(scalar, rel=1e-4, abs=1e-4)


def _kernel_tbl():
    tbl = np.zeros((1, 6), np.float32)
    tbl[0, :3] = MB.position
    tbl[0, 3] = MB.size
    return jnp.asarray(tbl)


def test_kernel_field_matches_jnp():
    pts = _points(seed=1)
    tbl = _kernel_tbl()
    px, py, pz = (jnp.asarray(pts[:, a]) for a in range(3))
    got = np.asarray(pm._mandelbulb_sd(tbl, 0, px, py, pz,
                                       float(MB.power), MB.iterations))
    want = np.asarray(mandelbulb_sd(jnp.asarray(pts), tbl[0, :3], tbl[0, 3],
                                    float(MB.power), MB.iterations))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_kernel_grad_matches_autodiff():
    pts = _points(seed=2)
    tbl = _kernel_tbl()
    px, py, pz = (jnp.asarray(pts[:, a]) for a in range(3))
    sd, gx, gy, gz = pm._mandelbulb_sd_grad(tbl, 0, px, py, pz,
                                            float(MB.power), MB.iterations)
    f = lambda q: mandelbulb_sd(q[None], tbl[0, :3], tbl[0, 3],
                                float(MB.power), MB.iterations)[0]
    gref = np.asarray(jax.vmap(jax.grad(f))(jnp.asarray(pts)))
    got = np.stack([np.asarray(gx), np.asarray(gy), np.asarray(gz)], -1)
    # rel 2e-3: 8th-degree polynomial recurrences amplify f32 roundoff
    # between the jet sweep's and autodiff's op orders
    np.testing.assert_allclose(got, gref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(sd),
        np.asarray(mandelbulb_sd(jnp.asarray(pts), tbl[0, :3], tbl[0, 3],
                                 float(MB.power), MB.iterations)),
        rtol=1e-5, atol=1e-5)


def test_y_axis_points_finite_value_and_grad():
    """Points exactly on the bulb's local y-axis (x = z = position.xz) hit
    the 0/0 of the raw power-8 polynomial; the factored form must produce
    finite values and tangents there (both jet sweep and autodiff)."""
    cx, cy, cz = MB.position
    pts = np.array([[cx, cy + dy, cz] for dy in
                    (-3.0, -1.0, 0.0, 0.5, 1.5, 4.0)], np.float32)
    tbl = _kernel_tbl()
    px, py, pz = (jnp.asarray(pts[:, a]) for a in range(3))
    sd, gx, gy, gz = pm._mandelbulb_sd_grad(tbl, 0, px, py, pz,
                                            float(MB.power), MB.iterations)
    for arr in (sd, gx, gy, gz):
        assert np.isfinite(np.asarray(arr)).all()
    f = lambda q: mandelbulb_sd(q[None], tbl[0, :3], tbl[0, 3],
                                float(MB.power), MB.iterations)[0]
    gref = np.asarray(jax.vmap(jax.grad(f))(jnp.asarray(pts)))
    assert np.isfinite(gref).all()


def test_parser_writer_roundtrip():
    text = ("Camera 0 0 6 0 0 -1 0 1 0\n"
            "Camera FOV 55\n"
            "Light 6 8 4\n"
            "Color 0.4 0.7 0.9\n"
            "Mandelbulb 0.25 -0.1 -5 1.5 5\n"
            "Mandelbulb 1 2 3 0.5\n")
    sc = parse_scene(text)
    a, b = sc.tree.children
    assert isinstance(a, Mandelbulb) and a.iterations == 5
    assert a.size == 1.5 and a.color == (0.4, 0.7, 0.9)
    assert b.iterations == 6 and b.power == 8        # defaults
    sc2 = parse_scene(scene_to_text(sc))
    assert sc2.tree.children[0] == a
    assert sc2.tree.children[1] == b


def _world(mode=Mode.UNION):
    children = [
        bounds(60.0),
        MB,
        Sphere((4.0, 0.0, -5.0), 1.2, color=(0.3, 0.8, 0.4)),
    ]
    if mode == Mode.DIFFERENCE:
        children = [
            bounds(60.0),
            ListNode(Mode.DIFFERENCE,
                     [Sphere((0.25, -0.1, -5.0), 1.6,
                             color=(0.9, 0.4, 0.2)), MB]),
            Sphere((4.0, 0.0, -5.0), 1.2, color=(0.3, 0.8, 0.4)),
        ]
    tree = ListNode(Mode.UNION, children)
    return compile_tree(tree, [Light((6.0, 8.0, 4.0))],
                        Camera(position=(0, 0.5, 4), fov=55.0))


def test_compile_plan_records_structure():
    plan, tables = _world()
    assert plan.proc, "Mandelbulb leaves must be recorded in plan.proc"
    (leaf, kind, power, iters), = plan.proc
    assert (kind, power, iters) == ("bulb", 8.0, 5)
    assert plan.kernel is not None
    tagged = [r for g in plan.kernel.groups for r in g.runs
              if isinstance(r[0], tuple)]
    assert tagged and tagged[0][0] == ("bulb", 8.0, 5)
    assert float(tables.prim_aux[leaf, 0]) == MB.size


CFG = RenderConfig(width=24, height=16, ssaa=1, iterations=150,
                   shadows=True, normal_mode="fd")


@pytest.mark.slow
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


def test_scene_sd_finite_everywhere():
    plan, tables = _world()
    pts = jnp.asarray(_points(n=512, seed=3, span=8.0))
    assert np.all(np.isfinite(np.asarray(scene_sd(plan, tables, pts))))


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
    assert np.abs(np.asarray(g_ift.prim_color)[leaf]).max() > 1e-6


def test_winner_backward_matches_autodiff_at_fixed_points():
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
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3 * scale,
                                   err_msg=f"mismatch in {field}")


def test_size_homogeneity_identity():
    """d DE/d size from the homogeneity formula (what theta_cotangents
    computes from per-ray sd/g/p) against autodiff of the field itself."""
    pts = jnp.asarray(_points(n=256, seed=7))
    c = jnp.asarray(MB.position, jnp.float32)

    def de(s):
        return mandelbulb_sd(pts, c, s, float(MB.power), MB.iterations)

    s0 = jnp.float32(MB.size)
    sd, dsize = jax.jvp(de, (s0,), (jnp.float32(1.0),))
    g = jax.vmap(jax.grad(
        lambda q: mandelbulb_sd(q[None], c, s0, float(MB.power),
                                MB.iterations)[0]))(pts)
    formula = (sd - jnp.sum(g * (pts - c), axis=-1)) / s0
    np.testing.assert_allclose(np.asarray(formula), np.asarray(dsize),
                               rtol=2e-3, atol=2e-3)


def test_native_parser_parity():
    """The C++ parser twin handles the Mandelbulb extension keyword: same
    tables as the Python compiler, structural (power, iterations) split
    back out of the aux slots into plan-static form."""
    from raymarching_tpu import compile_scene
    from raymarching_tpu.native import available, native_parse_scene

    if not available():
        pytest.skip("native library not built")
    text = ("Color 0.4 0.7 0.9\n"
            "Mandelbulb 0.25 -0.1 -5 1.5 5\n"
            "Mandelbulb 1 2 -8 0.75\n"     # default iterations 6
            "Mandelbox 0 0 -12 1 2 7\n"    # mixed kinds in one scene
            "Sphere 4 0 -6 1.2\n"
            "Light 6 8 4\n")
    res = native_parse_scene(text)
    plan, tables = compile_scene(parse_scene(text))
    np.testing.assert_array_equal(res["prim_type"],
                                  np.asarray(plan.prim_type, np.int32))
    np.testing.assert_allclose(res["prim_pos"], tables.prim_pos, atol=0)
    np.testing.assert_allclose(res["prim_aux"], tables.prim_aux, atol=0)
    np.testing.assert_allclose(res["prim_color"], tables.prim_color, atol=0)
    assert res["proc"] == plan.proc == ((0, "bulb", 8.0, 5),
                                        (1, "bulb", 8.0, 6),
                                        (2, "mb", 2.0, 7))


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
