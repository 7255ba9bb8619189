"""Benchmark: Mrays/s/chip, forward+backward, MengerSponge scene.

Workload (BASELINE.json north star): the demo scene (MengerSponge iters=3 +
DeathStar + 2 spheres + floor + bounds, 2 lights — 428 primitives) at
512x512, SSAA 2x2, 1000 march iterations, hard shadows: one forward render
fused with a full backward sweep (gradients to every scene parameter).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
BOTH execution regimes are measured and reported every run:

  * ``exact_mrays``  — exact reference-table semantics (the apples-to-apples
    number against the reference's own math);
  * ``fused_mrays``  — the opt-in space-folded Menger mode (same zero set,
    conservative distances; enabled for the headline only if its image
    passes an on-hardware allclose gate against the exact path).

The headline ``value`` is the fused number when the gate passes, else the
exact number; the other regime always rides along in the same JSON object.
``vs_baseline`` is against the reference's best published number: its GL
compute shader renders 1024x768 SSAA 3x3 in 185.161 s on a GTX 1060
(reference README.md:95) = 0.0382 Mrays/s — forward only; we charge
ourselves forward+backward and still compare against it.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MRAYS = 7.0778880e6 / 185.161 / 1e6  # 0.03822 Mrays/s (GTX 1060)


def _measure(plan, tables, cfg, backend, reps=3):
    from raymarching_tpu.api import render_tables

    def loss_fn(t):
        img = render_tables(plan, t, cfg, backend=backend)
        return jnp.mean(img)

    step = jax.jit(jax.value_and_grad(loss_fn))

    def run_once():
        loss, grads = step(tables)
        # Force real host transfers: block_until_ready is unreliable on
        # tunneled platforms — fetching the values is the ground truth.
        return float(loss), np.asarray(grads.prim_pos)

    loss, g = run_once()          # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        loss, g = run_once()
    dt = (time.perf_counter() - t0) / reps

    assert np.all(np.isfinite(g)), "non-finite gradients"
    assert loss > 0, "degenerate render"
    return cfg.rays_per_image / dt / 1e6


def _device_watchdog(timeout_s: float = 240.0) -> str:
    """Probe backend init in a SUBPROCESS with a hard timeout.

    When the axon tunnel is down, jax backend initialization blocks for
    tens of minutes inside a C call before raising UNAVAILABLE — a thread
    timer cannot interrupt it, and the driver would record a stack trace
    instead of a JSON record.  A throwaway subprocess is killable."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-u", "-c",
             "import jax; d = jax.devices(); print(d[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        if r.returncode == 0:
            return ""
        return (r.stderr.strip().splitlines() or ["backend init failed"])[-1]
    except subprocess.TimeoutExpired:
        return f"backend init timed out after {timeout_s:.0f}s (tunnel down?)"


def main():
    err = _device_watchdog()
    if err:
        print(json.dumps({
            "metric": "mrays_per_s_fwd_bwd_menger512_ssaa2",
            "value": 0.0, "unit": "Mrays/s/chip", "vs_baseline": 0.0,
            "error": f"TPU unavailable, bench did not run: {err}"}))
        return 0

    from raymarching_tpu import RenderConfig, compile_scene, load_scene
    from raymarching_tpu.api import render_tables, resolve_backend

    width = height = 512
    ssaa = 2
    cfg = RenderConfig(width=width, height=height, ssaa=ssaa,
                       iterations=1000, shadows=True,
                       normal_mode="fd", ray_chunk=65536)
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    scene = load_scene(os.path.join(here, "scenes", "demo.txt"))
    plan, tables = compile_scene(scene)
    backend = resolve_backend("auto")

    exact_mrays = _measure(plan, tables, cfg, backend)

    # Fused-generator fast mode (space-folded Menger, validated identical
    # zero set): eligible for the headline only if its image passes an
    # allclose gate against the exact-table path on this hardware.
    fused_mrays = None
    fused_ok = False
    if backend in ("pallas", "mega") and any(
            g.fused for g in (plan.kernel.groups if plan.kernel else ())):
        gate_cfg = cfg.replace(width=128, height=128, ray_chunk=0)
        a = np.asarray(render_tables(plan, tables, gate_cfg,
                                     backend=backend))
        b = np.asarray(render_tables(
            plan, tables, gate_cfg.replace(fused_generators=True),
            backend=backend))
        diff = np.abs(a - b).max(axis=-1)
        fused_ok = bool((diff < 5e-3).mean() > 0.995)
        fused_mrays = _measure(plan, tables,
                               cfg.replace(fused_generators=True), backend)

    headline = fused_mrays if (fused_ok and fused_mrays) else exact_mrays
    tag = f"{backend}_fused" if (fused_ok and fused_mrays) else backend
    record = {
        "metric": f"mrays_per_s_fwd_bwd_menger512_ssaa2_{tag}",
        "value": round(headline, 4),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(headline / BASELINE_MRAYS, 2),
        "exact_mrays": round(exact_mrays, 4),
        "exact_vs_baseline": round(exact_mrays / BASELINE_MRAYS, 2),
    }
    if fused_mrays is not None:
        record["fused_mrays"] = round(fused_mrays, 4)
        record["fused_gate_ok"] = fused_ok
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
