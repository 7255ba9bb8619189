"""Frame decomposition of the HEADLINE fwd+bwd step (fused+analytic).

The r3 close-out measured ~40% of the 22 ms fwd+bwd frame outside any
kernel (shade VJP + raygen VJP + reorder transposes + one-hot reductions)
but never published a per-stage breakdown.  This instrument times every
stage of the production step in ONE process on real hardware (pipelined
dispatches, one scalar fetch — bench.py protocol) so an optimization can
be judged against the stage it claims to attack:

  forward            raygen (jnp) -> to_blocked -> 16x chunked mega kernel
                     -> from_blocked -> SSAA mean
  backward per chunk fused_winner_eval (1 kernel) -> jnp shade VJP ->
                     winner-Hessian chain (_gather_rows + algebra) ->
                     theta cotangents (_segment_add) -> color _segment_add
  backward frame     reorder transposes' VJP + raygen VJP + lax.map glue

Writes frame_decomp.json at the repo root and prints it.  Per-chunk
stages are timed on one 65536-ray chunk and scaled x(num chunks);
``unaccounted`` is the full-step time minus everything attributed — if it
grows, a stage is missing from the model, not from the frame.

Run ON the TPU host: python benchmarks/frame_decomp.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)


_FLOOR_S = None


def _floor() -> float:
    """Median dispatch+fetch round trip (~30 ms over the axon tunnel) —
    subtracted from every pipelined measurement; per-chunk stages cost
    0.1-1 ms each, so leaving the floor in inflated every r3 stage number
    by ~0.9 ms x16 chunks (the 'stages sum >> whole backward' anomaly)."""
    global _FLOOR_S
    if _FLOOR_S is None:
        f = jax.jit(lambda x: jnp.sum(x * jnp.float32(1.0000001)))
        x = jnp.ones((8, 128), jnp.float32)
        float(f(x))
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        _FLOOR_S = float(np.median(ts))
    return _FLOOR_S


def _timeit(fn, *args, target_s: float = 1.2, reps: int = 3) -> float:
    """Seconds per call: pipelined depth sized to ~target_s, one scalar
    fetch per rep, the measured dispatch+fetch floor subtracted, min over
    reps (the tunnel only ever ADDS noise)."""
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    float(fn(*args))
    once = time.perf_counter() - t0            # includes ~30 ms round trip
    depth = int(np.clip(round(target_s / max(once - _floor(), 1e-4)),
                        8, 2048))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(depth):
            out = fn(*args)
        float(out)
        ts.append((time.perf_counter() - t0 - _floor()) / depth)
    return float(max(min(ts), 0.0))


def main():
    from raymarching_tpu import RenderConfig, compile_scene, load_scene
    from raymarching_tpu.api import render_tables
    from raymarching_tpu.core import camera as cam
    from raymarching_tpu.core.order import (block_dims, from_blocked,
                                            to_blocked)
    from raymarching_tpu.ops import scene_vjp as sv
    from raymarching_tpu.ops.pallas_render import (_fused_fwd,
                                                   _fused_analytic_bwd,
                                                   _lambert_replay,
                                                   pallas_render_rays)
    from raymarching_tpu.core import shading as sh

    cfg = RenderConfig(width=512, height=512, ssaa=2, iterations=1000,
                       shadows=True, normal_mode="analytic",
                       fused_generators=True, ray_chunk=65536)
    scene = load_scene(os.path.join(_ROOT, "scenes", "demo.txt"))
    plan, tables = compile_scene(scene)
    H, W, S = cfg.height, cfg.width, cfg.samples_per_pixel
    R = H * W * S
    chunk = cfg.ray_chunk
    nchunks = R // chunk
    res = {}

    # ---- ground truth: the full production step --------------------------
    def loss(t):
        return jnp.mean(render_tables(plan, t, cfg, backend="mega"))

    step = jax.jit(jax.value_and_grad(loss))
    out = step(tables)
    assert np.isfinite(float(out[0]))
    res["full_fwd_bwd"] = _timeit(lambda t: step(t)[0], tables)

    # forward primal with the black-lane skip OFF (what the vjp fwd runs)
    nocfg = cfg.replace(shade_skip_black=False)
    fwd = jax.jit(lambda t: jnp.mean(render_tables(plan, t, nocfg,
                                                   backend="mega")))
    res["forward_primal"] = _timeit(fwd, tables)

    # ---- forward stages ---------------------------------------------------
    bd = block_dims(H, W, S, cfg.tile_sublanes * 128)
    wts = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((R, 3)).astype(np.float32))

    def raygen(t):
        _, d = cam.generate_rays(t, cfg)
        fl = to_blocked(d.reshape(R, 3), H, W, S, *bd)
        return jnp.sum(fl * wts)

    res["raygen_fwd"] = _timeit(jax.jit(raygen), tables)
    res["raygen_fwd_bwd"] = _timeit(
        jax.jit(lambda t: jax.value_and_grad(raygen)(t)[0]), tables)

    # kernel-only forward: pre-blocked dirs, 16 chunked mega launches
    _, d0 = cam.generate_rays(tables, cfg)
    dblk = jax.device_put(
        to_blocked(d0.reshape(R, 3), H, W, S, *bd).reshape(nchunks, chunk,
                                                           3))
    origin = tables.cam_position

    def kern_fwd(t, db):
        def one(d):
            outs = pallas_render_rays(plan, nocfg, origin, d, t,
                                      interpret=False)
            return jnp.sum(outs[4]) + jnp.sum(outs[0])
        return jnp.sum(jax.lax.map(one, db))

    res["mega_kernel_fwd_chunked"] = _timeit(jax.jit(kern_fwd), tables,
                                             dblk)

    # reorder transposes alone (fwd + vjp)
    def reorder(x):
        return jnp.sum(from_blocked(x, H, W, S, *bd) * wts)

    xdev = jax.device_put(np.random.default_rng(1)
                          .standard_normal((R, 3)).astype(np.float32))
    res["reorder_fwd"] = _timeit(jax.jit(reorder), xdev)
    res["reorder_fwd_bwd"] = _timeit(
        jax.jit(lambda x: jax.value_and_grad(reorder)(x)[0]), xdev)

    # ---- backward stages (one chunk, scaled) ------------------------------
    out_c, resid = _fused_fwd(plan, cfg, False, tables, origin, dblk[0])
    resid = jax.device_put(resid)
    g_out = jax.device_put(jnp.ones_like(out_c) / R)

    def bwd_chunk(resid, g):
        tb, ob, db = _fused_analytic_bwd(plan, cfg, resid, g, False)
        return jnp.sum(tb.prim_pos) + jnp.sum(db)

    t_bwd_chunk = _timeit(jax.jit(bwd_chunk), resid, g_out)
    res["bwd_chunk_total_scaled"] = t_bwd_chunk * nchunks

    (tbl_r, org_r, dirs_r, p_r, sd_r, conv_r, cidx_r, smask_r, t_r,
     sfac_r, aofac_r, _b, wres_r) = resid
    if wres_r is not None:
        # A/B: the same backward WITHOUT the forward-saved winner
        # residuals (it launches its own winner kernel — the r3 shape).
        resid_norw = resid[:-1] + (None,)
        res["bwd_chunk_total_noresid_scaled"] = _timeit(
            jax.jit(bwd_chunk), resid_norw, g_out) * nchunks

    # stage 1: the winner kernel launch (sd, widx, g at the hit)
    def winner(p, t):
        sd0, widx0, g0 = sv.fused_winner_eval(plan, cfg, p, t, False)
        return jnp.sum(g0) + jnp.sum(sd0)

    res["bwd_winner_kernel_scaled"] = _timeit(
        jax.jit(winner), p_r, tables) * nchunks

    sd0, widx0, g0 = jax.jit(
        lambda p, t: sv.fused_winner_eval(plan, cfg, p, t, False))(
        p_r, tables)

    # stage 2: jnp shade VJP (replay forward + transpose)
    def shade_vjp(t, p, g, cidx, smask, gb):
        # mirrors _fused_analytic_bwd: one-hot MXU color fetch (r4)
        color_p = sv._gather_rows(
            cidx.reshape(-1), jnp.asarray(t.prim_color),
            sv._fused_candidates(plan, False)).reshape(cidx.shape + (3,))

        def shade(tables_, p_, g_, color_):
            n = sh.normalize(g_)
            light = _lambert_replay(plan, cfg, tables_, p_, n, smask,
                                    sfac_r, aofac_r)
            return light * color_

        _, vjp = jax.vjp(shade, t, p, g, color_p)
        tb, pb, gbar, cb = vjp(gb)
        return (jnp.sum(pb) + jnp.sum(gbar) + jnp.sum(cb)
                + jnp.sum(tb.light_pos))

    res["bwd_shade_vjp_scaled"] = _timeit(
        jax.jit(shade_vjp), tables, p_r, g0, cidx_r, smask_r,
        g_out) * nchunks

    # stage 3: winner-Hessian chain (_gather_rows + algebra + segment_add)
    gbar = jax.device_put(jnp.ones_like(g0) / R)

    def hess(t, widx, g, gb, sd):
        pb, pos, aux = sv.fused_winner_hessian_chain(plan, t, widx, g, gb,
                                                     sd)
        return jnp.sum(pb) + jnp.sum(pos) + jnp.sum(aux)

    res["bwd_hessian_chain_scaled"] = _timeit(
        jax.jit(hess), tables, widx0, g0, gbar, sd0) * nchunks

    # stage 4: theta cotangents (9-column _segment_add)
    u = jax.device_put(jnp.full(sd0.shape, 1e-6, jnp.float32))

    def theta(t, widx, g, u, sd, p):
        tb = sv.fused_theta_cotangents(plan, t, widx, g, u, sd, p)
        return jnp.sum(tb.prim_pos) + jnp.sum(tb.prim_aux)

    res["bwd_theta_cotangents_scaled"] = _timeit(
        jax.jit(theta), tables, widx0, g0, u, sd0, p_r) * nchunks

    # stage 5: the color _segment_add
    cb = jax.device_put(jnp.ones(cidx_r.shape + (3,), jnp.float32) / R)

    def colorseg(cidx, cb):
        return jnp.sum(sv._segment_add(cidx.reshape(-1), cb.reshape(-1, 3),
                                       int(tables.prim_color.shape[0])))

    res["bwd_color_segment_scaled"] = _timeit(
        jax.jit(colorseg), cidx_r, cb) * nchunks

    # ---- bookkeeping -------------------------------------------------------
    res["num_chunks"] = nchunks
    res["mrays_fwd_bwd"] = R / res["full_fwd_bwd"] / 1e6
    bwd_attr = res["bwd_chunk_total_scaled"]
    res["derived"] = {
        "backward_total (full - forward_primal)":
            res["full_fwd_bwd"] - res["forward_primal"],
        "bwd stages sum (winner+shade+hessian+theta+color)":
            res["bwd_winner_kernel_scaled"] + res["bwd_shade_vjp_scaled"]
            + res["bwd_hessian_chain_scaled"]
            + res["bwd_theta_cotangents_scaled"]
            + res["bwd_color_segment_scaled"],
        "bwd_chunk_total_scaled": bwd_attr,
        "forward glue (fwd - raygen - kernel - reorder)":
            res["forward_primal"] - res["raygen_fwd"]
            - res["mega_kernel_fwd_chunked"] - res["reorder_fwd"],
    }
    ms = {k: (round(v * 1e3, 3) if isinstance(v, float) else
              ({kk: round(vv * 1e3, 3) for kk, vv in v.items()}
               if isinstance(v, dict) else v))
          for k, v in res.items()}
    ms["mrays_fwd_bwd"] = round(res["mrays_fwd_bwd"], 2)
    ms["unit"] = "ms per 512x512xSSAA2 frame (1.049 Mrays)"
    out_path = os.path.join(_ROOT, "frame_decomp.json")
    with open(out_path, "w") as f:
        json.dump(ms, f, indent=1)
    print(json.dumps(ms, indent=1))


if __name__ == "__main__":
    main()
