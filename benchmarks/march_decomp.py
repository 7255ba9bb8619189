"""Per-step bookkeeping decomposition of the march kernel (r5 verdict #1).

roofline_r4 showed the fused march issuing at 48.7% of its own field
speed-of-light while the exact march issues at 86.6% — the gap is fixed
per-step overhead around the field eval, and this harness measures WHICH
mechanism costs what by timing kernel variants that differ in exactly one
mechanism, all at the production workload (demo scene, 512^2 SSAA2
block-ordered rays, 1000-iteration cap, K-step exit cadence):

  prod       the production _march_kernel body, replicated: every step
             loads p/done from VMEM scratch, re-loads the (loop-invariant)
             direction tiles, and stores p/sd/done back — 8 tile loads +
             5 tile stores per step around the field eval.
  regblock   direction tiles hoisted out of the loop; the K unrolled
             steps of one while-body iteration keep (p, sd, done) in
             locals (vector registers), touching scratch once per BLOCK
             instead of once per step.  Bitwise-identical results (same
             arithmetic, same order — only memory movement changes).
  nofreeze   regblock minus the done-mask freeze algebra (unconditional
             step/sd updates; done still latches for the exit check, and
             a latched done never unlatches, so per-tile step counts are
             IDENTICAL — timing-only variant, results differ on lanes
             that keep drifting after convergence).
  noclamp    regblock minus the MAX_STEP clamp (MAX_STEP = 1e5 never
             fires on the demo scene, so results stay bitwise-identical).
  k4/k16/k32 regblock at other exit-check cadences (the all-lanes
             jnp.min(done) reduce serializes the VPU; larger K amortizes
             it against wasted remainder steps).

Usage (TPU host):  python benchmarks/march_decomp.py [--json out.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import roofline as rl
from raymarching_tpu.core.march import MAX_STEP
from raymarching_tpu.ops.pallas_march import (LANES, _build_table,
                                              _scene_sd_tile, _tbl_spec,
                                              _tiling, kernel_key,
                                              preload_table)

INTERPRET = False


def _vkernel(kp, iterations, eps, fused, mode, K, *refs):
    """March variant kernel — see module docstring for the mode table."""
    (tbl_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
     px_ref, py_ref, pz_ref, sd_ref, done_ref) = refs
    dtype = ox_ref.dtype
    tbl = preload_table(kp, tbl_ref, fused)
    px_ref[...] = ox_ref[...]
    py_ref[...] = oy_ref[...]
    pz_ref[...] = oz_ref[...]
    sd_ref[...] = jnp.full(ox_ref.shape, jnp.inf, dtype)
    done_ref[...] = jnp.zeros(ox_ref.shape, dtype)

    K = min(K, max(iterations, 1))
    main = (iterations // K) * K
    freeze = mode != "nofreeze"
    clamp = mode != "noclamp"

    def cond(carry):
        it, all_done = carry
        return jnp.logical_and(it < main, jnp.logical_not(all_done))

    if mode == "prod":
        # replicate the production body: scratch round-trip every step
        def one_step(_):
            px, py, pz = px_ref[...], py_ref[...], pz_ref[...]
            done = done_ref[...]
            sd = _scene_sd_tile(kp, tbl, px, py, pz, dtype, fused=fused)
            active = done < 0.5
            step = jnp.where(active, jnp.minimum(sd, MAX_STEP), 0.0)
            px = px + step * dx_ref[...]
            py = py + step * dy_ref[...]
            pz = pz + step * dz_ref[...]
            px_ref[...] = px
            py_ref[...] = py
            pz_ref[...] = pz
            sd_new = jnp.where(active, sd, sd_ref[...])
            sd_ref[...] = sd_new
            done_new = jnp.where(sd_new < eps, 1.0, done)
            done_ref[...] = done_new
            return done_new

        def body(carry):
            it, _ = carry
            done_new = None
            for _ in range(K):
                done_new = one_step(None)
            return it + K, jnp.min(done_new) > 0.5

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.asarray(False)))
        for _ in range(iterations - main):
            one_step(None)
        return

    # register-blocked family: hoisted dirs, locals across the K block
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
    hoist = mode in ("clampvec", "hoistconst")
    if hoist:
        # splat constants materialized ONCE outside the loop (hypothesis:
        # Mosaic re-materializes scalar splats per loop iteration)
        maxv = jnp.full(ox_ref.shape, MAX_STEP, dtype) + 0.0 * dx
        if mode == "hoistconst":
            zerov = jnp.zeros(ox_ref.shape, dtype) + 0.0 * dx
            onev = jnp.ones(ox_ref.shape, dtype) + 0.0 * dx

    def step_local(st):
        px, py, pz, sd_prev, done = st
        sd = _scene_sd_tile(kp, tbl, px, py, pz, dtype, fused=fused)
        if freeze:
            active = done < 0.5
            clamped = (jnp.minimum(sd, maxv) if hoist
                       else (jnp.minimum(sd, MAX_STEP) if clamp else sd))
            step = jnp.where(active, clamped,
                             zerov if mode == "hoistconst" else 0.0)
            sd_new = jnp.where(active, sd, sd_prev)
        else:
            step = jnp.minimum(sd, MAX_STEP) if clamp else sd
            sd_new = sd
        px = px + step * dx
        py = py + step * dy
        pz = pz + step * dz
        done = jnp.where(sd_new < eps,
                         onev if mode == "hoistconst" else 1.0, done)
        return (px, py, pz, sd_new, done)

    def read():
        return (px_ref[...], py_ref[...], pz_ref[...], sd_ref[...],
                done_ref[...])

    def write(st):
        (px_ref[...], py_ref[...], pz_ref[...], sd_ref[...],
         done_ref[...]) = st

    if mode in ("carry", "fori44"):
        # no scratch traffic at all: full VECTOR while/fori carries
        # (materialized layouts via +0.0*dx — the splat-carry limitation
        # is about unmaterialized splats, the SOL kernel already carries
        # loaded vectors through fori)
        px0 = ox_ref[...] + 0.0 * dx
        py0 = oy_ref[...] + 0.0 * dy
        pz0 = oz_ref[...] + 0.0 * dz
        sd0 = jnp.full(ox_ref.shape, jnp.inf, dtype) + 0.0 * dx
        done0 = jnp.zeros(ox_ref.shape, dtype) + 0.0 * dx
        if mode == "fori44":
            # fixed 44 steps (the demo's tile mean), no exit machinery —
            # timing diagnostic only, results not comparable
            def fbody(_, st):
                return step_local(st)
            st = jax.lax.fori_loop(0, 44, fbody,
                                   (px0, py0, pz0, sd0, done0))
        else:
            def vcond(c):
                return jnp.logical_and(c[0] < main,
                                       jnp.logical_not(c[1]))

            def vbody(c):
                it, _, st = c[0], c[1], c[2:]
                for _ in range(K):
                    st = step_local(st)
                return (it + K, jnp.min(st[4]) > 0.5) + st

            out = jax.lax.while_loop(
                vcond, vbody,
                (jnp.int32(0), jnp.asarray(False), px0, py0, pz0, sd0,
                 done0))
            st = out[2:]
            for _ in range(iterations - main):
                st = step_local(st)
        (px_ref[...], py_ref[...], pz_ref[...], sd_ref[...],
         done_ref[...]) = st
        return

    def body(carry):
        it, _ = carry
        st = read()
        for _ in range(K):
            st = step_local(st)
        write(st)
        return it + K, jnp.min(st[4]) > 0.5

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.asarray(False)))
    if iterations - main:
        st = read()
        for _ in range(iterations - main):
            st = step_local(st)
        write(st)


def variant_call(kp, iterations, eps, tile_sublanes, num_tiles, fused,
                 num_prims, mode, K):
    rows = num_tiles * tile_sublanes
    block = (tile_sublanes, LANES)
    ray_spec = pl.BlockSpec(block, lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    kernel = functools.partial(_vkernel, kp, iterations, eps, fused, mode,
                               K)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[_tbl_spec(num_prims)] + [ray_spec] * 6,
        out_specs=(ray_spec,) * 5,
        out_shape=(out_shape,) * 5,
        interpret=INTERPRET,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--fused", type=int, default=1)
    args = ap.parse_args()
    global INTERPRET
    if args.interpret:
        INTERPRET = True
        rl.INTERPRET = True
        jax.config.update("jax_platforms", "cpu")

    from raymarching_tpu import RenderConfig, compile_scene, load_scene
    from raymarching_tpu.core import camera as cam
    from raymarching_tpu.core.order import block_dims, to_blocked

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan, tables = compile_scene(
        load_scene(os.path.join(here, "scenes", "demo.txt")))
    cfg = RenderConfig(width=args.width, height=args.width, ssaa=2,
                       iterations=args.iters, shadows=True)
    fused = bool(args.fused)
    kp = kernel_key(plan)

    origin, dirs = cam.generate_rays(tables, cfg)
    dirs = jnp.reshape(dirs, (-1, 3))
    S = cfg.samples_per_pixel
    bdims = block_dims(cfg.height, cfg.width, S, cfg.tile_sublanes * LANES)
    if bdims is not None:
        dirs = to_blocked(dirs, cfg.height, cfg.width, S, *bdims)
    o = jnp.broadcast_to(jnp.asarray(origin), dirs.shape)
    R = dirs.shape[0]
    num_tiles, prep, _ = _tiling(R, cfg.tile_sublanes)
    comps = [prep(o[:, a]) for a in range(3)]
    comps += [prep(dirs[:, a]) for a in range(3)]
    tbl = _build_table(tables, kp)
    num_prims = int(tables.prim_pos.shape[0])
    eps = cfg.surface_precision

    from raymarching_tpu.ops.pallas_march import _EXIT_CHECK_EVERY
    Kprod = _EXIT_CHECK_EVERY

    variants = [
        ("prod", "prod", Kprod),
        ("regblock", "regblock", Kprod),
        ("nofreeze", "nofreeze", Kprod),
        ("noclamp", "noclamp", Kprod),
        ("clampvec", "clampvec", Kprod),
        ("hoistconst", "hoistconst", Kprod),
        ("carry", "carry", Kprod),
        ("fori44", "fori44", Kprod),
        ("k4", "regblock", 4),
        ("k16", "regblock", 16),
        ("k32", "regblock", 32),
    ]

    report = {"workload": f"demo {args.width}^2 ssaa2 iters={args.iters} "
                          f"fused={fused} block-ordered",
              "platform": jax.devices()[0].platform}
    if not INTERPRET:
        report["roundtrip_floor_s"] = rl._roundtrip_floor()

    ref_out = None
    for name, mode, K in variants:
        call = variant_call(kp, args.iters, eps, cfg.tile_sublanes,
                            num_tiles, fused, num_prims, mode, K)
        f = jax.jit(lambda t, *c, _call=call: jnp.sum(_call(t, *c)[0]))
        if INTERPRET:
            outs = call(tbl, *comps)
            dt = float("nan")
        else:
            dt = rl._time_to_host(f, tbl, *comps)
            outs = jax.jit(lambda t, *c, _call=call: _call(t, *c))(
                tbl, *comps)
        outs = [np.asarray(x) for x in outs]
        if name == "prod":
            ref_out = outs
            bit = True
        else:
            bit = all(np.array_equal(a, b) for a, b in zip(ref_out, outs))
        rec = {"seconds": dt, "bitwise_vs_prod": bool(bit), "K": K}
        report[name] = rec
        print(f"[{name:9s}] {dt * 1e3:8.3f} ms  bitwise={bit}", flush=True)

    # production pallas_march cross-check (same body as 'prod' but via the
    # real entry point — guards against harness drift)
    from raymarching_tpu.ops.pallas_march import pallas_march
    f = jax.jit(lambda oo, dd, tb: jnp.sum(pallas_march(
        plan.kernel, cfg.iterations, eps, cfg.tile_sublanes, oo, dd, tb,
        fused=fused, interpret=INTERPRET).position))
    if not INTERPRET:
        report["production_entry_seconds"] = rl._time_to_host(f, o, dirs,
                                                              tables)

    if not INTERPRET:
        base = report["prod"]["seconds"]
        for name, _, _ in variants:
            report[name]["speedup_vs_prod"] = round(
                base / report[name]["seconds"], 4)
    if args.json:
        with open(args.json, "w") as fjson:
            json.dump(report, fjson, indent=1)
    print(json.dumps({k: v for k, v in report.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
