"""Sweep cost-ordering strategies on the fused headline regime.

Variants (all bit-exact by construction):
  * block        — baseline (no perm)
  * sum          — rows sorted by (primary + shadow) total, global
  * lex          — lexicographic (ceil(P/4), ceil(S1/4), ceil(S2/4))
  * local512     — sum-sorted within 512-row neighborhoods (16 tiles)
  * local2048    — sum-sorted within 2048-row neighborhoods

Run on the TPU host: ``python benchmarks/ab_cost_sweep.py``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import bench
    from raymarching_tpu import RenderConfig, compile_scene, load_scene
    from raymarching_tpu.api import resolve_backend
    from raymarching_tpu.core import camera as cam
    from raymarching_tpu.core.order import block_dims, to_blocked
    from raymarching_tpu.ops.pallas_march import (kernel_key, pallas_march,
                                                  pallas_surface_eval)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = load_scene(os.path.join(here, "scenes", "demo.txt"))
    plan, tables = compile_scene(scene)
    backend = resolve_backend("auto")
    fcfg = RenderConfig(width=512, height=512, ssaa=2, iterations=1000,
                        shadows=True, normal_mode="analytic",
                        fused_generators=True, ray_chunk=65536)
    kp = kernel_key(plan)

    # per-ray phase costs in kernel layout
    origin, dirs = cam.generate_rays(tables, fcfg)
    S = fcfg.samples_per_pixel
    R = fcfg.height * fcfg.width * S
    flat = to_blocked(dirs.reshape(R, 3), fcfg.height, fcfg.width, S,
                      *block_dims(fcfg.height, fcfg.width, S,
                                  fcfg.tile_sublanes * 128))
    o = jnp.broadcast_to(jnp.asarray(tables.cam_position, jnp.float32),
                         flat.shape)

    @jax.jit
    def phase_costs(o, d, tb):
        res, p_steps = pallas_march(kp, fcfg.iterations,
                                    fcfg.surface_precision,
                                    fcfg.tile_sublanes, o, d, tb,
                                    fused=True, with_steps=True)
        p = res.position
        _, _, g = pallas_surface_eval(kp, fcfg.fd_h, fcfg.tile_sublanes,
                                      p, tb, with_color=False,
                                      with_normal=True, fused=True,
                                      analytic=True)
        n = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True),
                            1e-30)
        s = p + n * (fcfg.surface_precision + fcfg.offset_precision)
        shad = []
        for li in range(plan.num_lights):
            r = tb.light_pos[li][None, :] - s
            tmax = jnp.linalg.norm(r, axis=-1)
            rd = r / jnp.maximum(tmax, 1e-30)[:, None]
            _, st = pallas_march(kp, fcfg.iterations,
                                 fcfg.surface_precision,
                                 fcfg.tile_sublanes, s, rd, tb, tmax=tmax,
                                 fused=True, with_steps=True)
            shad.append(st)
        return p_steps, shad

    t0 = time.perf_counter()
    p_steps, shad = phase_costs(o, flat, tables)
    P = np.asarray(p_steps).reshape(-1, 128).max(axis=1)
    Ss = [np.asarray(s).reshape(-1, 128).max(axis=1) for s in shad]
    print(f"[phase costs] {time.perf_counter() - t0:.1f}s", flush=True)

    total = P + sum(Ss)
    perms = {
        "sum": np.argsort(total, kind="stable").astype(np.int32),
        "lex": np.lexsort(tuple(np.ceil(s / 4) for s in reversed(Ss))
                          + (np.ceil(P / 4),)).astype(np.int32),
    }
    for seg in (512, 2048):
        p = np.arange(len(total), dtype=np.int32)
        for s0 in range(0, len(total), seg):
            sl = slice(s0, s0 + seg)
            p[sl] = s0 + np.argsort(total[sl], kind="stable")
        perms[f"local{seg}"] = p

    out = {}
    base = bench._measure(plan, tables, fcfg, backend)
    out["block"] = base
    print(f"[block] {base['median']:.2f} Mrays/s", flush=True)
    for name, perm in perms.items():
        r = bench._measure(plan, tables, fcfg, backend, ray_perm=perm)
        out[name] = r
        print(f"[{name}] {r['median']:.2f} Mrays/s "
              f"({r['median'] / base['median']:.3f}x)", flush=True)
    print(json.dumps({k: round(v["median"], 3) for k, v in out.items()}))


if __name__ == "__main__":
    main()
