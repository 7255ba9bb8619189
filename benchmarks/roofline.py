"""Empirical roofline for the march kernel: how close is the renderer to
this chip's measured speed of light?

The interesting question a raw Mrays/s number cannot answer is *what
fraction of the hardware's arithmetic ceiling the kernel reaches* — and
where the rest goes.  MXU-FLOP "MFU" is the wrong yardstick for sphere
tracing (there are no matmuls in the hot loop; the march is pure VPU
min/select/mul-add work), so this harness measures the ceiling itself:

  1. ``vpu_fma``      — synthetic Pallas kernel, pure chained mul-add on a
                        resident VMEM tile: the chip's measured elementwise
                        f32 FLOP/s peak (speed of light for ANY pointwise
                        kernel).
  2. ``vpu_foldmix``  — same harness, but the op mix of the CSG fold
                        (abs/min/max/mul-add): the realistic ceiling for
                        SDF folding.
  3. ``field_sol``    — the REAL ``_scene_sd_tile`` evaluated back-to-back
                        with no march bookkeeping, no convergence logic and
                        no straggler waste: scene-field evaluations/s at
                        speed of light, exact and fused table variants.
  4. ``march_real``   — the production march kernel on the bench workload,
                        decomposed with its own per-ray step counters into
                        achieved field-evals/s, lane-level waste (converged
                        lanes a tile keeps stepping) and per-step overhead.

utilization = achieved evals/s ÷ field SOL; the gap factors measured here
(straggler waste × loop overhead) multiply out to explain it, which turns
"MFU is single digit" into an actionable decomposition.  Run on the TPU
host: ``python benchmarks/roofline.py [--json out.json]``.
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False       # --interpret: CPU smoke-test mode (not a benchmark)

SUBLANES = 512          # synthetic tile: [512, 128] f32 = 256 KiB in VMEM
LANES = 128
UNROLL = 64             # hand-unrolled ops per while iteration (Mosaic has
                        # no partial fori unroll; python loop = full unroll)


_FLOOR_S = None         # measured dispatch+fetch round trip (tunnel)


def _roundtrip_floor(reps=10) -> float:
    """Median dispatch+fetch round trip for a trivial kernel.  On the axon
    tunnel this is ~30 ms — LARGER than most kernels measured here, so
    every timing must amortize it (pipelined dispatch) and subtract it."""
    global _FLOOR_S
    if _FLOOR_S is None:
        f = jax.jit(lambda x: jnp.sum(x * jnp.float32(1.0000001)))
        x = jnp.ones((8, 128), jnp.float32)
        float(f(x))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        _FLOOR_S = float(np.median(ts))
    return _FLOOR_S


def _time_to_host(fn, *args, reps=5, k=16):
    """Median per-call wall time of fn(*args), measured PIPELINED: ``k``
    back-to-back dispatches with ONE host fetch of the last result.  The
    device stream is FIFO, so the last result materializing proves all k
    executed; the single ~30 ms tunnel round trip (measured, subtracted)
    no longer swamps millisecond kernels.  fn must return a SCALAR (fetch
    is sync ground truth — block_until_ready is unreliable here)."""
    floor = _roundtrip_floor()
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)     # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _i in range(k):
            out = fn(*args)
        np.asarray(out)
        ts.append((time.perf_counter() - t0 - floor) / k)
    return float(np.median(ts))


# ---------------------------------------------------------------- synthetic

def _chain_kernel(iters: int, mix: str, x_ref, o_ref):
    """iters x UNROLL dependent vector ops on a resident [S, 128] tile."""
    x = x_ref[...]
    a = jnp.float32(1.000001)
    b = jnp.float32(1e-7)

    def body(_, x):
        for k in range(UNROLL):
            if mix == "fma":
                x = x * a + b                       # 2 flops
            elif mix == "foldmix":
                # the CSG fold's steady-state mix per primitive-ish unit:
                # translate (add), abs, running min, scaled add
                if k % 4 == 0:
                    x = x + b
                elif k % 4 == 1:
                    x = jnp.abs(x)
                elif k % 4 == 2:
                    x = jnp.minimum(x, a)
                else:
                    x = x * a + b
            else:
                raise ValueError(mix)
        return x

    x = jax.lax.fori_loop(0, iters, body, x)
    o_ref[...] = x


def synthetic_peak(mix: str, iters: int = 4096) -> dict:
    """Measured elementwise throughput for the given op mix (Gop/s; an
    'op' is one vector instruction per element — fma counts 2 FLOPs)."""
    x = jnp.ones((SUBLANES, LANES), jnp.float32)
    call = pl.pallas_call(
        functools.partial(_chain_kernel, iters, mix),
        out_shape=jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )
    f = jax.jit(lambda v: jnp.sum(call(v)))    # scalar fetch (tunnel)
    dt = _time_to_host(f, x)
    ops = SUBLANES * LANES * iters * UNROLL
    gops = ops / dt / 1e9
    return {"mix": mix, "gops": gops,
            "gflops": gops * (2.0 if mix == "fma" else 1.25),
            "seconds": dt}


# ------------------------------------------------------------ field S.O.L.

def _field_kernel(kp, evals: int, fused: bool, tbl_ref, px_ref, py_ref,
                  pz_ref, o_ref):
    from raymarching_tpu.ops.pallas_march import (_scene_sd_tile,
                                                  preload_table)
    tbl = preload_table(kp, tbl_ref, fused)
    px, py, pz = px_ref[...], py_ref[...], pz_ref[...]
    acc = jnp.zeros(px.shape, jnp.float32)

    def body(_, carry):
        px, py, pz, acc = carry
        # 4 chained evals per loop iteration — the production march's
        # hand-unroll factor (_EXIT_CHECK_EVERY); one-eval iterations
        # under-measured the ceiling by pure loop overhead.
        for _u in range(4):
            sd = _scene_sd_tile(kp, tbl, px, py, pz, jnp.float32,
                                fused=fused)
            # advance a hair along +z so successive evals are
            # data-dependent (no DCE / no pipelining across evals,
            # like a real march)
            pz = pz + jnp.minimum(sd, 1.0) * jnp.float32(1e-3)
            acc = acc + sd
        return px, py, pz, acc

    _, _, _, acc = jax.lax.fori_loop(0, evals // 4, body,
                                     (px, py, pz, acc))
    o_ref[...] = acc


def _field_kernel_matched(kp, K: int, fused: bool, tbl_ref, steps_ref,
                          px_ref, py_ref, pz_ref, o_ref):
    """Field-only loop at the MARCH'S OWN per-tile schedule: each grid
    program runs ceil(steps/K)*K chained evals, where ``steps`` is the
    production march's recorded step count for this tile (SMEM scalar).
    This is the fair ceiling for the march: the r4 roofline amortized
    per-tile fixed cost over 256 straight evals while the real march
    averages ~43 steps per tile, which overstated the SOL by ~35% and
    understated issued_vs_sol accordingly (r5 verdict #1 /
    march_decomp_r5.json)."""
    from raymarching_tpu.ops.pallas_march import (_scene_sd_tile,
                                                  preload_table)
    tbl = preload_table(kp, tbl_ref, fused)
    px, py, pz = px_ref[...], py_ref[...], pz_ref[...]
    acc = jnp.zeros(px.shape, jnp.float32)
    blocks = (steps_ref[pl.program_id(0), 0] + (K - 1)) // K

    def body(_, carry):
        px, py, pz, acc = carry
        for _u in range(K):
            sd = _scene_sd_tile(kp, tbl, px, py, pz, jnp.float32,
                                fused=fused)
            pz = pz + jnp.minimum(sd, 1.0) * jnp.float32(1e-3)
            acc = acc + sd
        return px, py, pz, acc

    _, _, _, acc = jax.lax.fori_loop(0, blocks, body, (px, py, pz, acc))
    o_ref[...] = acc


def field_sol_matched(plan, tables, cfg, fused: bool, tile_steps,
                      origin, dirs) -> dict:
    """Field SOL at the march's exact schedule (see
    _field_kernel_matched): same tile count, same per-tile eval counts,
    same ray tiles — only the march bookkeeping and exit machinery are
    absent."""
    from raymarching_tpu.ops.pallas_march import (LANES, _EXIT_CHECK_EVERY,
                                                  _build_table, _tbl_spec,
                                                  _tiling, kernel_key)

    kp = kernel_key(plan)
    sub = cfg.tile_sublanes
    R = dirs.shape[0]
    num_tiles, prep, _ = _tiling(R, sub)
    o = jnp.broadcast_to(jnp.asarray(origin), dirs.shape)
    # start a bit into the scene along each ray (field_sol's convention:
    # all lanes AT the origin makes the per-eval culls fire statically
    # and the field artificially cheap — measured 59 vs 44 Geval/s)
    comps = [prep(o[:, a] + 2.0 * dirs[:, a]) for a in range(3)]
    tbl = _build_table(tables, kp)
    K = _EXIT_CHECK_EVERY
    steps = jnp.asarray(np.asarray(tile_steps, np.int32).reshape(-1, 1))

    spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_field_kernel_matched, kp, K, fused),
        grid=(num_tiles,),
        out_shape=jax.ShapeDtypeStruct((num_tiles * sub, LANES),
                                       jnp.float32),
        in_specs=[_tbl_spec(int(tbl.shape[0]) - 1),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec, spec, spec],
        out_specs=spec,
        interpret=INTERPRET,
    )
    f = jax.jit(lambda *a: jnp.sum(call(*a)))
    dt = _time_to_host(f, tbl, steps, *comps)
    quant = np.ceil(np.asarray(tile_steps) / K) * K
    lane_evals = float(quant.sum()) * sub * LANES
    return {"fused": fused, "lane_evals_per_s": lane_evals / dt,
            "seconds": dt, "lane_evals": lane_evals}


def field_sol(plan, tables, cfg, fused: bool, evals: int = 256,
              tiles: int = 64) -> dict:
    """Back-to-back scene-field evaluations/s: the march's ceiling once all
    control flow, convergence checks and stragglers are removed."""
    from raymarching_tpu.core import camera as cam
    from raymarching_tpu.ops.pallas_march import (LANES, _build_table,
                                                  _tbl_spec, kernel_key)

    kp = kernel_key(plan)
    sub = cfg.tile_sublanes
    rows = tiles * sub
    origin, dirs = cam.generate_rays(tables, cfg)
    d = np.resize(np.asarray(dirs.reshape(-1, 3)), (rows * LANES, 3))
    o = np.asarray(origin, np.float32)
    p = o[None, :] + 2.0 * d                     # start a bit into the scene
    comps = [jnp.asarray(p[:, a].reshape(rows, LANES)) for a in range(3)]
    tbl = _build_table(tables, kp)

    spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_field_kernel, kp, evals, fused),
        grid=(tiles,),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        in_specs=[_tbl_spec(int(tbl.shape[0]) - 1), spec, spec, spec],
        out_specs=spec,
        interpret=INTERPRET,
    )
    # scalar fetch: the tunnel ships bytes at ~40 MB/s — a 512 KB output
    # per rep would silently become most of the "kernel" time.
    f = jax.jit(lambda *a: jnp.sum(call(*a)))
    dt = _time_to_host(f, tbl, *comps)
    lane_evals = rows * LANES * evals
    return {"fused": fused, "lane_evals_per_s": lane_evals / dt,
            "seconds": dt}


# ------------------------------------------------------------- real march

def _layout_straggler(steps, tile_rays, iterations, K) -> dict:
    """Straggler lane-bound of one ray LAYOUT from per-ray step counts
    (in that layout's order): a tile issues ceil(max/K)*K evals per lane."""
    ntiles = math.ceil(steps.size / tile_rays)
    pad = np.zeros(ntiles * tile_rays, np.float32)
    pad[:steps.size] = steps
    per_tile = pad.reshape(ntiles, tile_rays)
    tile_steps = np.minimum(np.ceil(per_tile.max(axis=1) / K) * K,
                            iterations)
    lane_evals = float((tile_steps * tile_rays).sum())
    return {
        "tile_mean_steps": float(tile_steps.mean()),
        "lane_evals": lane_evals,
        "straggler_waste": lane_evals / max(float(steps.sum()), 1.0),
    }


def march_real(plan, tables, cfg, fused: bool) -> dict:
    """The production march on the bench camera: time it, and decompose
    with the kernel's own per-ray step counters.

    Rays are BLOCK-ORDERED (compact pixel blocks per tile) — the
    production mega-kernel layout since r3 — and the decomposition also
    reports the straggler bound of the scan layout (rows of the image,
    r3's harness layout) and of the cost-sorted oracle (rows sorted by
    max step count — what cost-ordered scheduling would achieve for THIS
    phase alone; see api.plan_cost_order's MEASURED OUTCOME note for why
    that oracle does not survive the full multi-phase frame)."""
    from raymarching_tpu.core import camera as cam
    from raymarching_tpu.core.order import block_dims, to_blocked
    from raymarching_tpu.ops.pallas_march import (LANES, _EXIT_CHECK_EVERY,
                                                  pallas_march)

    origin, dirs = cam.generate_rays(tables, cfg)
    dirs = jnp.reshape(dirs, (-1, 3))
    S = cfg.samples_per_pixel
    bdims = block_dims(cfg.height, cfg.width, S,
                       cfg.tile_sublanes * LANES)
    scan_dirs = dirs
    if bdims is not None:
        dirs = to_blocked(dirs, cfg.height, cfg.width, S, *bdims)
    o = jnp.broadcast_to(jnp.asarray(origin), dirs.shape)

    # Fetch a SCALAR reduction, not the [R, 3] positions: the data
    # dependency still forces the full march before the host sees the
    # value, but the tunnel no longer ships 12 MB per rep (which showed
    # up as fake per-step overhead in the decomposition).
    f = jax.jit(lambda oo, dd, tb: jnp.sum(pallas_march(
        plan.kernel, cfg.iterations, cfg.surface_precision,
        cfg.tile_sublanes, oo, dd, tb, fused=fused,
        interpret=INTERPRET).position))
    dt = _time_to_host(f, o, dirs, tables)

    _, steps = jax.jit(lambda oo, dd, tb: pallas_march(
        plan.kernel, cfg.iterations, cfg.surface_precision,
        cfg.tile_sublanes, oo, dd, tb, fused=fused,
        with_steps=True, interpret=INTERPRET))(o, dirs, tables)
    steps = np.asarray(steps).ravel()

    R = dirs.shape[0]
    tile_rays = cfg.tile_sublanes * LANES
    K = _EXIT_CHECK_EVERY
    # matched-schedule SOL: field-only at this march's own per-tile step
    # counts (the fair ceiling — see _field_kernel_matched)
    ntiles = math.ceil(steps.size / tile_rays)
    pad = np.zeros(ntiles * tile_rays, np.float32)
    pad[:steps.size] = steps
    tile_steps = np.minimum(
        np.ceil(pad.reshape(ntiles, tile_rays).max(axis=1) / K) * K,
        cfg.iterations)
    matched = field_sol_matched(plan, tables, cfg, fused, tile_steps,
                                origin, dirs)
    block = _layout_straggler(steps, tile_rays, cfg.iterations, K)
    # alternative layouts, host-side from the SAME per-ray counters
    # (per-ray steps are layout-independent): scan = the image-row order
    # (undo the blocking), cost oracle = sublane rows sorted by row max.
    if bdims is not None:
        from raymarching_tpu.core.order import from_blocked
        scan_steps = np.asarray(from_blocked(
            jnp.asarray(steps), cfg.height, cfg.width, S, *bdims)).ravel()
    else:
        scan_steps = steps
    scan = _layout_straggler(scan_steps, tile_rays, cfg.iterations, K)
    rows = steps.reshape(-1, LANES)
    cost_rows = rows[np.argsort(rows.max(axis=1), kind="stable")]
    cost = _layout_straggler(cost_rows.ravel(), tile_rays,
                             cfg.iterations, K)
    lane_evals = block["lane_evals"]
    active_evals = float(steps.sum())

    return {
        "fused": fused,
        "layout": "block",
        "seconds": dt,
        "rays": int(R),
        "mean_steps": float(steps.mean()),
        "tile_mean_steps": block["tile_mean_steps"],
        "lane_evals": lane_evals,
        "active_evals": active_evals,
        "straggler_waste": block["straggler_waste"],
        "straggler_waste_scan": scan["straggler_waste"],
        "straggler_waste_cost_oracle": cost["straggler_waste"],
        "achieved_lane_evals_per_s": lane_evals / dt,
        "achieved_active_evals_per_s": active_evals / dt,
        "matched_sol_seconds": matched["seconds"],
        "matched_sol_lane_evals_per_s": matched["lane_evals_per_s"],
        "issued_vs_matched_sol": ((lane_evals / dt)
                                  / matched["lane_evals_per_s"]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, help="also write JSON here")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke test (timings meaningless)")
    args = ap.parse_args()

    global INTERPRET
    if args.interpret:
        INTERPRET = True
        jax.config.update("jax_platforms", "cpu")

    from raymarching_tpu import RenderConfig, compile_scene, load_scene

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = load_scene(os.path.join(here, "scenes", "demo.txt"))
    plan, tables = compile_scene(scene)
    cfg = RenderConfig(width=args.width, height=args.width, ssaa=2,
                       iterations=args.iters, shadows=True)

    report = {"platform": jax.devices()[0].platform,
              "device": str(jax.devices()[0])}
    if not INTERPRET:
        report["roundtrip_floor_s"] = _roundtrip_floor()
        floor_ms = report["roundtrip_floor_s"] * 1e3
        print(f"[dispatch+fetch floor] {floor_ms:.1f} ms (amortized over "
              "16 pipelined dispatches, subtracted)", flush=True)

    for mix in ("fma", "foldmix"):
        r = synthetic_peak(mix)
        report[f"peak_{mix}"] = r
        print(f"[synthetic {mix:8s}] {r['gops']:8.1f} Gop/s "
              f"({r['gflops']:.0f} GFLOP/s equiv)", flush=True)

    for fused in (False, True):
        r = field_sol(plan, tables, cfg, fused)
        report[f"field_sol_{'fused' if fused else 'exact'}"] = r
        print(f"[field SOL {'fused' if fused else 'exact':5s}] "
              f"{r['lane_evals_per_s'] / 1e9:6.3f} Geval/s", flush=True)

    for fused in (False, True):
        r = march_real(plan, tables, cfg, fused)
        key = f"march_{'fused' if fused else 'exact'}"
        report[key] = r
        sol = report[f"field_sol_{'fused' if fused else 'exact'}"]
        util = r["achieved_lane_evals_per_s"] / sol["lane_evals_per_s"]
        # CAVEAT encoded in the field names: issued lane-evals on CONVERGED
        # lanes are mostly cull-skipped inside _scene_sd_tile (the running
        # minimum sits at ~0 at the surface, so the group-bound proof fires)
        # — issued/SOL can exceed 1 and straggler_waste (a lane-count, not a
        # time ratio) is an UPPER BOUND on what compaction could recover.
        r["issued_vs_sol"] = util
        r["active_utilization"] = (r["achieved_active_evals_per_s"]
                                   / sol["lane_evals_per_s"])
        print(f"[march {'fused' if fused else 'exact':5s}] "
              f"{r['achieved_lane_evals_per_s'] / 1e9:6.3f} Geval/s issued "
              f"({r['achieved_active_evals_per_s'] / 1e9:.3f} active = "
              f"{100 * r['active_utilization']:5.1f}% of SOL) | vs "
              f"MATCHED-schedule SOL {100 * r['issued_vs_matched_sol']:5.1f}%"
              f" | straggler "
              f"lane-bound {r['straggler_waste']:.2f}x (scan "
              f"{r['straggler_waste_scan']:.2f}x, cost-oracle "
              f"{r['straggler_waste_cost_oracle']:.2f}x) | mean steps "
              f"{r['mean_steps']:.1f} (tile {r['tile_mean_steps']:.1f})",
              flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if not isinstance(v, dict)}))


if __name__ == "__main__":
    main()
