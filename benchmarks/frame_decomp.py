"""Frame decomposition of the HEADLINE fwd+bwd step (fused+analytic).

r4's version timed each stage as an ISOLATED jitted program and scaled
one-chunk numbers by 16 — but every isolated dispatch pays fixed
per-dispatch overhead beyond the measured fetch floor (tunnel dispatch
cost, program launch), so five 0.3-1 ms stages summed to 26.9 ms against
a 3.2 ms derived backward, and "forward glue" came out negative (r5
verdict #6).

This redesign times CUMULATIVE PREFIXES of the production pipeline — one
jitted program per prefix, each running stages 1..k at the FULL frame
footprint (all 16 chunks under the same ``lax.map`` the production step
uses) — and reports stage costs as consecutive differences.  The fixed
per-dispatch cost is the P0 baseline and cancels in every difference;
the final prefix is the whole fwd+bwd pipeline, cross-checked against
the production ``jax.value_and_grad`` step (they are separate XLA
programs, so fusion differences of a few % are expected and recorded as
``model_vs_production_pct``).

Prefix chain (each includes everything before it):

  P0  baseline       trivial device scalar (per-dispatch floor residue)
  P1  raygen         camera ray directions (jnp) + to_blocked
  P2  fwd_kernel     + _fused_fwd over 16 chunks (mega kernel + residual
                     save — the custom-vjp forward)
  P3  image          + color from_blocked + SSAA mean (the primal loss)
  P4  shade_vjp      + per-chunk one-hot color fetch, shade jax.vjp
  P5  color_seg      + per-chunk color segment-add
  P6  hessian        + per-chunk winner-Hessian chain
  P7  theta_ift      + per-chunk IFT weights, theta cotangents, o/d bars
  P8  glue_bwd       + d_bar un-blocking + raygen VJP (camera cotangents)
                     + cross-chunk table-cotangent accumulation

Stage cost k = P[k] - P[k-1].  Writes frame_decomp.json at the repo
root.  Run ON the TPU host: python benchmarks/frame_decomp.py
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
    """Median dispatch+fetch round trip (~30 ms over the axon tunnel)."""
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
    """Seconds per call, pipelined (depth sized to ~target_s, one scalar
    fetch per rep, floor subtracted, min over reps — the tunnel only ever
    ADDS noise)."""
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    float(fn(*args))
    once = time.perf_counter() - t0
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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--smoke", action="store_true",
                    help="CPU correctness pass, no timing")
    args = ap.parse_args()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from raymarching_tpu import RenderConfig, compile_scene, load_scene
    from raymarching_tpu.api import render_tables
    from raymarching_tpu.core import camera as cam
    from raymarching_tpu.core import shading as sh
    from raymarching_tpu.core.order import (block_dims, from_blocked,
                                            to_blocked)
    from raymarching_tpu.ops import scene_vjp as sv
    from raymarching_tpu.ops.pallas_render import (_fused_fwd,
                                                   _lambert_replay,
                                                   ift_ray_weights)

    cfg = RenderConfig(width=args.width, height=args.width, ssaa=2,
                       iterations=args.iters,
                       shadows=True, normal_mode="analytic",
                       fused_generators=True,
                       ray_chunk=min(65536,
                                     args.width * args.width * 4 // 4))
    scene = load_scene(os.path.join(_ROOT, "scenes", "demo.txt"))
    plan, tables = compile_scene(scene)
    interp = bool(args.smoke)
    if args.smoke:
        global _timeit
        def _timeit(fn, *a, **k):
            import time as _t
            t0 = _t.perf_counter()
            float(fn(*a))
            return _t.perf_counter() - t0
    H, W, S = cfg.height, cfg.width, cfg.samples_per_pixel
    R = H * W * S
    chunk = cfg.ray_chunk
    nchunks = R // chunk
    bd = block_dims(H, W, S, cfg.tile_sublanes * 128)
    origin = tables.cam_position
    g_scale = jnp.float32(1.0 / R)

    # ---- ground truth: the production step -------------------------------
    def loss(t):
        return jnp.mean(render_tables(plan, t, cfg, backend="mega", interpret=interp))

    step = jax.jit(jax.value_and_grad(loss))
    out = step(tables)
    assert np.isfinite(float(out[0]))
    full = _timeit(lambda t: step(t)[0], tables)

    fwd_cfg = cfg.replace(shade_skip_black=False)
    fwd = jax.jit(lambda t: jnp.mean(render_tables(plan, t, fwd_cfg,
                                                   backend="mega", interpret=interp)))
    forward_primal = _timeit(fwd, tables)

    # ---- the prefix chain -------------------------------------------------
    # Each prefix is ONE jitted program running the pipeline up to stage
    # k; lax.map drives the per-chunk stages exactly like production.
    # Scalar outputs sum every stage's results so nothing is DCE'd.

    def bwd_chunk_stages(t, resid, upto):
        """Per-chunk backward stages (mirrors _fused_analytic_bwd), run
        up to ``upto``; returns a scalar keeping all computed stages
        live, plus (d_bar, table cotangent pieces) for the glue stage."""
        (tables_, origin_, dirs_, p, sd, conv, cidx, smask, tt,
         sfac, aofac, _b, wres) = resid
        sd0, widx0, g0 = wres
        g_out = jnp.broadcast_to(g_scale, p.shape[:-1] + (3,))
        acc = jnp.float32(0.0)
        color_p = sv._gather_rows(
            cidx.reshape(-1), jnp.asarray(t.prim_color),
            sv._fused_candidates(plan, False)).reshape(cidx.shape + (3,))

        def shade(tables2, p_, g_, color_):
            n = sh.normalize(g_)
            light = _lambert_replay(plan, cfg, tables2, p_, n, smask,
                                    sfac, aofac)
            return light * color_

        _, vjp_shade = jax.vjp(shade, t, p, g0, color_p)
        tables_bar, p_bar, g_bar, color_bar = vjp_shade(g_out)
        acc += (jnp.sum(p_bar) + jnp.sum(g_bar)
                + jnp.sum(tables_bar.light_pos))
        if upto == "shade_vjp":
            return acc, None
        pc_bar = sv._segment_add_rows(cidx.reshape(-1),
                                      color_bar.reshape(-1, 3),
                                      int(t.prim_color.shape[0]),
                                      sv._fused_candidates(plan, False))
        acc += jnp.sum(pc_bar)
        if upto == "color_seg":
            return acc, None
        hess_p_bar, hess_pos, hess_aux = sv.fused_winner_hessian_chain(
            plan, t, widx0, g0, g_bar, sd0)
        p_bar = p_bar + hess_p_bar
        acc += jnp.sum(hess_pos) + jnp.sum(hess_aux)
        if upto == "hessian":
            return acc, None
        denom = jnp.sum(g0 * dirs_, axis=-1)
        t_bar = jnp.where(conv, jnp.sum(p_bar * dirs_, axis=-1), 0.0)
        w = ift_ray_weights(t_bar, denom, cfg.ift_damping)
        gp_w = w[..., None] * g0
        tables_bar2 = sv.fused_theta_cotangents(plan, t, widx0, g0, w,
                                                sd=sd0, p=p)
        d_bar = tt[..., None] * (p_bar + gp_w)
        acc += (jnp.sum(tables_bar2.prim_pos) + jnp.sum(tables_bar2.prim_aux)
                + jnp.sum(d_bar))
        if upto == "theta_ift":
            return acc, None
        # glue: full table cotangent accumulation across stages
        tb = jax.tree_util.tree_map(jnp.add, tables_bar, tables_bar2)
        tb = tb._replace(prim_color=tb.prim_color + pc_bar)
        return acc, (d_bar, tb)

    def prefix(upto):
        def f(t):
            acc = jnp.sum(jnp.asarray(t.prim_pos)) * 1e-9
            if upto == "baseline":
                return acc
            _, d = cam.generate_rays(t, cfg)
            dblk = to_blocked(d.reshape(R, 3), H, W, S, *bd)
            acc += jnp.sum(dblk) * 1e-9
            if upto == "raygen":
                return acc
            dch = dblk.reshape(nchunks, chunk, 3)

            if upto == "fwd_kernel":
                def one(dc):
                    out_c, resid = _fused_fwd(plan, cfg, interp, t, origin,
                                              dc)
                    return jnp.sum(out_c) + jnp.sum(resid[3])
                return acc + jnp.sum(jax.lax.map(one, dch))

            def fwd_one(dc):
                out_c, resid = _fused_fwd(plan, cfg, interp, t, origin, dc)
                return out_c, resid

            colors, resids = jax.lax.map(fwd_one, dch)
            img = jnp.mean(
                from_blocked(colors.reshape(R, 3), H, W, S,
                             *bd).reshape(H, W, S, 3), axis=2)
            acc += jnp.mean(img)
            if upto == "image":
                return acc

            if upto in ("shade_vjp", "color_seg", "hessian", "theta_ift"):
                def bwd_one(resid):
                    a, _ = bwd_chunk_stages(t, resid, upto)
                    return a
                return acc + jnp.sum(jax.lax.map(bwd_one, resids))

            # glue_bwd: complete the backward — d_bar un-block + raygen
            # VJP for camera cotangents + cross-chunk table accumulation
            def bwd_full(resid):
                a, extras = bwd_chunk_stages(t, resid, "glue")
                return a, extras

            accs, (d_bars, tbs) = jax.lax.map(bwd_full, resids)
            acc += jnp.sum(accs)
            tb_total = jax.tree_util.tree_map(
                lambda x: jnp.sum(x, axis=0), tbs)
            acc += jnp.sum(tb_total.prim_pos) + jnp.sum(tb_total.prim_color)
            d_bar_flat = from_blocked(d_bars.reshape(R, 3), H, W, S, *bd)

            def raygen_dirs(t2):
                _, d2 = cam.generate_rays(t2, cfg)
                return d2.reshape(R, 3)

            _, vjp_rg = jax.vjp(raygen_dirs, t)
            (t_rg,) = vjp_rg(d_bar_flat)
            acc += jnp.sum(t_rg.cam_position)
            return acc
        return jax.jit(f)

    chain = ["baseline", "raygen", "fwd_kernel", "image", "shade_vjp",
             "color_seg", "hessian", "theta_ift", "glue_bwd"]
    prefix_s = {}
    for name in chain:
        prefix_s[name] = _timeit(prefix(name), tables)
        print(f"[prefix {name:10s}] {prefix_s[name] * 1e3:8.3f} ms",
              flush=True)

    stages = {}
    for a, b in zip(chain[:-1], chain[1:]):
        stages[b] = prefix_s[b] - prefix_s[a]

    total_model = prefix_s[chain[-1]] - prefix_s["baseline"]
    res = {
        "full_fwd_bwd": full,
        "forward_primal": forward_primal,
        "prefix_seconds": prefix_s,
        "stage_seconds": stages,
        "num_chunks": nchunks,
        "mrays_fwd_bwd": R / full / 1e6,
        "derived": {
            "model_total (last prefix - baseline)": total_model,
            "model_vs_production_pct": round(
                100.0 * (total_model - full) / full, 2),
            "backward_total (full - forward_primal)": full - forward_primal,
            "largest_backward_stage": max(
                ("shade_vjp", "color_seg", "hessian", "theta_ift",
                 "glue_bwd"), key=lambda k: stages[k]),
        },
    }
    ms = {}
    for k, v in res.items():
        if isinstance(v, float):
            ms[k] = round(v * 1e3, 3)
        elif isinstance(v, dict):
            ms[k] = {kk: (round(vv * 1e3, 3) if isinstance(vv, float)
                          else vv) for kk, vv in v.items()}
        else:
            ms[k] = v
    ms["derived"]["model_vs_production_pct"] = \
        res["derived"]["model_vs_production_pct"]
    ms["mrays_fwd_bwd"] = round(res["mrays_fwd_bwd"], 2)
    ms["unit"] = "ms per 512x512xSSAA2 frame (1.049 Mrays)"
    out_path = os.path.join(_ROOT, "frame_decomp.json")
    with open(out_path, "w") as f:
        json.dump(ms, f, indent=1)
    print(json.dumps(ms, indent=1))


if __name__ == "__main__":
    main()
