"""Decompose the cost-order A/B: pure march kernel vs full mega forward,
block vs cost layouts, to locate where cost ordering wins or loses.

Run on the TPU host: ``python benchmarks/ab_cost_decomp.py``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _floor(reps=8):
    f = jax.jit(lambda x: jnp.sum(x * jnp.float32(1.0000001)))
    x = jnp.ones((8, 128), jnp.float32)
    float(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


FLOOR = None


def timeit(fn, *args, k=16, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        np.asarray(out)
        ts.append((time.perf_counter() - t0 - FLOOR) / k)
    return float(np.median(ts))


def main():
    global FLOOR
    from raymarching_tpu import RenderConfig, compile_scene, load_scene
    from raymarching_tpu.api import plan_cost_order, render_tables
    from raymarching_tpu.core import camera as cam
    from raymarching_tpu.core.order import (block_dims, resolve_ray_order,
                                            row_cost_perm, row_permuters,
                                            to_blocked)
    from raymarching_tpu.ops.pallas_march import pallas_march

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = load_scene(os.path.join(here, "scenes", "demo.txt"))
    plan, tables = compile_scene(scene)
    fcfg = RenderConfig(width=512, height=512, ssaa=2, iterations=1000,
                        shadows=True, normal_mode="analytic",
                        fused_generators=True, ray_chunk=65536)
    FLOOR = _floor()
    out = {"floor_s": FLOOR}

    # rays in kernel layout
    origin, dirs = cam.generate_rays(tables, fcfg)
    S = fcfg.samples_per_pixel
    R = fcfg.height * fcfg.width * S
    flat = np.asarray(dirs.reshape(R, 3))
    bdims = block_dims(fcfg.height, fcfg.width, S, fcfg.tile_sublanes * 128)
    flat = np.asarray(to_blocked(jnp.asarray(flat), fcfg.height, fcfg.width,
                                 S, *bdims))
    o = np.broadcast_to(np.asarray(tables.cam_position, np.float32),
                        flat.shape).copy()

    # per-ray primary steps in this layout
    _, steps = jax.jit(lambda oo, dd, tb: pallas_march(
        plan.kernel, fcfg.iterations, fcfg.surface_precision,
        fcfg.tile_sublanes, oo, dd, tb, fused=True,
        with_steps=True))(o, flat, tables)
    steps = np.asarray(steps).ravel()
    perm = row_cost_perm(steps)
    apply_p, _ = row_permuters(perm)
    flat_c = np.asarray(apply_p(jnp.asarray(flat)))
    o_c = o

    def issued(st):
        t = np.ceil(st.reshape(-1, fcfg.tile_sublanes * 128).max(axis=1)
                    / 4) * 4
        return float((np.minimum(t, fcfg.iterations)
                      * fcfg.tile_sublanes * 128).sum())

    out["issued_block"] = issued(steps)
    st_c = steps.reshape(-1, 128)[perm].ravel()
    out["issued_cost"] = issued(st_c)
    out["issued_ratio"] = out["issued_cost"] / out["issued_block"]

    # 1. pure march kernel, full frame in one call
    march = jax.jit(lambda oo, dd, tb: jnp.sum(pallas_march(
        plan.kernel, fcfg.iterations, fcfg.surface_precision,
        fcfg.tile_sublanes, oo, dd, tb, fused=True).position))
    out["march_block_ms"] = timeit(march, o, jnp.asarray(flat),
                                   tables) * 1e3
    out["march_cost_ms"] = timeit(march, o_c, jnp.asarray(flat_c),
                                  tables) * 1e3

    # 2. full mega forward (chunked), block vs cost
    fwd_b = jax.jit(lambda t: jnp.mean(render_tables(
        plan, t, fcfg, backend="mega")))
    fwd_c = jax.jit(lambda t: jnp.mean(render_tables(
        plan, t, fcfg, backend="mega", ray_perm=perm)))
    out["mega_fwd_block_ms"] = timeit(fwd_b, tables) * 1e3
    out["mega_fwd_cost_ms"] = timeit(fwd_c, tables) * 1e3

    # 3. permutation overhead alone: identity perm (same gathers, no
    #    reordering effect)
    ident = np.arange(len(perm), dtype=np.int32)
    fwd_i = jax.jit(lambda t: jnp.mean(render_tables(
        plan, t, fcfg, backend="mega", ray_perm=ident)))
    out["mega_fwd_identityperm_ms"] = timeit(fwd_i, tables) * 1e3

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
