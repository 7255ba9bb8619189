"""A/B: analytic vs FD normals on the demo scene, one process, pipelined.

Round-3 verdict item #4: after the collapsed-lattice winner gradient +
per-tile cull landed in the analytic path (_menger_carve_lattice_grad),
measure whether analytic normals now beat the 6-eval FD stencil end-to-end
(fwd+bwd, the bench workload).  All four regimes (exact/fused x fd/analytic)
are timed IN THIS PROCESS with the pipelined protocol so the comparison is
immune to the documented cross-process tunnel swings.

Writes one JSON line per regime to stdout and a summary file if --json.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(plan, tables, cfg, backend, reps=5, pipeline=8):
    from raymarching_tpu.api import render_tables

    def loss_fn(t):
        img = render_tables(plan, t, cfg, backend=backend)
        return jnp.mean(img)

    step = jax.jit(jax.value_and_grad(loss_fn))
    t0 = time.perf_counter()
    loss, grads = step(tables)
    loss = float(loss)
    compile_s = time.perf_counter() - t0
    g = np.asarray(grads.prim_pos)
    assert np.all(np.isfinite(g)), "non-finite gradients"
    assert loss > 0, "degenerate render"

    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _i in range(pipeline):
            out = step(tables)
        float(out[0])
        rates.append(pipeline * cfg.rays_per_image
                     / (time.perf_counter() - t0) / 1e6)
    rates = np.asarray(rates)
    return {
        "median": float(np.median(rates)),
        "min": float(rates.min()),
        "max": float(rates.max()),
        "spread_pct": float(100.0 * (rates.max() - rates.min())
                            / np.median(rates)),
        "compile_s": round(compile_s, 1),
        "loss": loss,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import os
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    from raymarching_tpu import RenderConfig, compile_scene, load_scene
    from raymarching_tpu.api import render_tables, resolve_backend

    cfg0 = RenderConfig(width=512, height=512, ssaa=2, iterations=1000,
                        shadows=True, normal_mode="fd", ray_chunk=65536)
    scene = load_scene(os.path.join(here, "scenes", "demo.txt"))
    plan, tables = compile_scene(scene)
    backend = resolve_backend("auto")

    regimes = {
        "exact_fd": cfg0,
        "exact_analytic": cfg0.replace(normal_mode="analytic"),
        "fused_fd": cfg0.replace(fused_generators=True),
        "fused_analytic": cfg0.replace(fused_generators=True,
                                       normal_mode="analytic"),
    }

    # Image equivalence gate: analytic must visually match FD before its
    # speed matters (small frame, fetched once).
    gate_cfg = cfg0.replace(width=128, height=128, ray_chunk=0)
    a = np.asarray(render_tables(plan, tables, gate_cfg, backend=backend))
    b = np.asarray(render_tables(
        plan, tables, gate_cfg.replace(normal_mode="analytic"),
        backend=backend))
    diff = np.abs(a - b).max(axis=-1)
    gate = {"analytic_allclose_pct": float(100.0 * (diff < 5e-3).mean()),
            "max_diff": float(diff.max())}
    print(json.dumps({"gate": gate}), flush=True)

    out = {"backend": backend, "gate": gate}
    for name, cfg in regimes.items():
        rec = measure(plan, tables, cfg, backend, reps=args.reps)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)

    out["analytic_vs_fd_exact"] = round(
        out["exact_analytic"]["median"] / out["exact_fd"]["median"], 3)
    out["analytic_vs_fd_fused"] = round(
        out["fused_analytic"]["median"] / out["fused_fd"]["median"], 3)
    print(json.dumps({"summary": {
        "analytic_vs_fd_exact": out["analytic_vs_fd_exact"],
        "analytic_vs_fd_fused": out["analytic_vs_fd_fused"]}}), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
