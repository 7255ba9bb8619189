"""BASELINE config ladder: render every rung, gate on allclose, report.

The five rungs from BASELINE.json:
  1. single Sphere + one light, no shadows, no SSAA, 256^2
  2. Box + Cross, multiple lights + hard shadows, 512^2
  3. DeathStar + SSAA 2x2
  4. MengerSponge iters=2 with shadows + SSAA (camera-pose grads checked)
  5. full demo scene: MengerSponge iters=3, SSAA 3x3, 1024^2

Each rung renders on the fast backend, is allclose-gated against the jnp
oracle at reduced resolution, and reports Mrays/s.  Run on a TPU host:

    python benchmarks/ladder.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="smaller resolutions (CI-sized)")
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args()

    from raymarching_tpu import RenderConfig, compile_scene, load_scene
    from raymarching_tpu.api import render_tables, resolve_backend

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "scenes")
    q = 4 if args.quick else 1
    rungs = [
        ("config1", "config1.txt",
         dict(width=256 // q, height=256 // q, ssaa=1, shadows=False)),
        ("config2", "config2.txt",
         dict(width=512 // q, height=512 // q, ssaa=1, shadows=True)),
        ("config3", "config3.txt",
         dict(width=512 // q, height=512 // q, ssaa=2, shadows=True)),
        ("config4", "config4.txt",
         dict(width=512 // q, height=512 // q, ssaa=2, shadows=True)),
        ("config5", "demo.txt",
         dict(width=1024 // q, height=1024 // q, ssaa=3, shadows=True)),
    ]
    backend = resolve_backend(args.backend)
    print(f"backend: {backend}")

    for name, scene_file, over in rungs:
        scene = load_scene(os.path.join(here, scene_file))
        plan, tables = compile_scene(scene)
        cfg = RenderConfig(iterations=1000, normal_mode="fd",
                           ray_chunk=65536, **over)
        f = jax.jit(lambda t, c=cfg: render_tables(plan, t, c,
                                                   backend=backend))
        img = np.asarray(f(tables))          # compile + warm
        t0 = time.perf_counter()
        img = np.asarray(f(tables))
        dt = time.perf_counter() - t0
        rays = cfg.rays_per_image

        # allclose gate AT THE BENCHMARKED RESOLUTION, against the jnp
        # path: an independent implementation of the same exact-table
        # semantics (XLA while-march + scene_sd — none of the Pallas kernel
        # code), cheap enough to run at full resolution.  jnp==ref
        # equivalence is itself covered by the CI suite, so transitively
        # this anchors the published number to the oracle.  Isolated pixels
        # on shadow/occlusion edges can flip from last-ulp f32 differences
        # between compiled backends, so the gate is "99.5% of pixels within
        # 5e-3" (same contract as the test suite), with the median reported
        # for the bulk.
        a = img
        gate_backend = "jnp" if backend != "jnp" else "ref"
        b = np.asarray(render_tables(plan, tables, cfg,
                                     backend=gate_backend))
        diff = np.abs(a - b).max(axis=-1)
        frac = float((diff < 5e-3).mean())
        gate = "OK" if frac > 0.995 else f"FAIL ({frac:.4f} within tol)"

        print(f"{name:9s} {cfg.width}x{cfg.height} ssaa{cfg.ssaa} "
              f"{plan.num_primitives:4d} prims: {dt:7.3f}s "
              f"{rays / dt / 1e6:8.2f} Mrays/s  allclose[{gate}] "
              f"median={np.median(diff):.2e} max={diff.max():.2e}")


if __name__ == "__main__":
    main()
