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
    conservative distances) with in-kernel analytic normals (the faster
    gradient estimator on folded fields, ab_analytic_r3.json); enabled for
    the headline only if its image passes an on-hardware allclose gate
    against the exact path.

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


def _roundtrip_floor(reps=10) -> float:
    """Median dispatch+fetch round trip of a trivial kernel — ~30 ms over
    the axon tunnel, i.e. a fixed tax on every fetch-per-rep timing."""
    f = jax.jit(lambda x: jnp.sum(x * jnp.float32(1.0000001)))
    x = jnp.ones((8, 128), jnp.float32)
    float(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _measure(plan, tables, cfg, backend, reps=5, pipeline=8):
    """Throughput stats under TWO protocols:

    * ``pipelined`` (the headline): ``pipeline`` back-to-back dispatches
      of the fwd+bwd step with ONE host fetch of the last loss.  The
      device stream is FIFO, so the fetch proves all executed; the ~30 ms
      tunnel round trip amortizes away.  This is what a production host
      (PCIe-attached, not fetching scalars over HTTP per step) sees.
    * ``per_dispatch``: one fetch per rep — comparable to the r1/r2
      records, which unknowingly included the round trip (~26% at these
      frame times).

    Every rep is timed individually IN THIS PROCESS and min/median/max
    reported: a regression is only credible when it exceeds the spread
    (same-commit cross-process swings of ~9% are documented)."""
    from raymarching_tpu.api import render_tables

    def loss_fn(t):
        img = render_tables(plan, t, cfg, backend=backend)
        return jnp.mean(img)

    step = jax.jit(jax.value_and_grad(loss_fn))

    # compile + warm + correctness gate (fetch everything once)
    loss, grads = step(tables)
    loss = float(loss)
    g = np.asarray(grads.prim_pos)
    assert np.all(np.isfinite(g)), "non-finite gradients"
    assert loss > 0, "degenerate render"

    def stats(rates):
        rates = np.asarray(rates)
        return {
            "median": float(np.median(rates)),
            "min": float(rates.min()),
            "max": float(rates.max()),
            "spread_pct": float(100.0 * (rates.max() - rates.min())
                                / np.median(rates)),
            "reps": int(len(rates)),
        }

    per_dispatch = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = step(tables)
        float(out[0]), np.asarray(out[1].prim_pos)
        per_dispatch.append(
            cfg.rays_per_image / (time.perf_counter() - t0) / 1e6)

    pipelined = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _i in range(pipeline):
            out = step(tables)
        float(out[0])        # one fetch syncs the whole FIFO queue
        pipelined.append(pipeline * cfg.rays_per_image
                         / (time.perf_counter() - t0) / 1e6)

    rec = stats(pipelined)
    rec["per_dispatch"] = stats(per_dispatch)
    rec["pipeline_depth"] = int(pipeline)
    return rec


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

    exact = _measure(plan, tables, cfg, backend)

    # Informational third regime: exact tables + analytic winner-gradient
    # normals (same field, a.e.-equal estimator; 1.18x faster than FD via
    # the single-launch winner-Hessian backward, ab_analytic_r3.json) —
    # the exact headline stays FD because its claim is bit-parity with the
    # reference's own estimator (scene.cpp:70-89).
    exact_analytic = _measure(plan, tables,
                              cfg.replace(normal_mode="analytic"), backend)

    # Fused-generator fast mode (space-folded Menger, validated identical
    # zero set) with ANALYTIC normals — the r3 A/B (ab_analytic_r3.json)
    # measured the in-kernel winner gradient 2.2x faster than the FD
    # stencil on the folded field (45.0 vs 20.8 Mrays/s via the
    # single-launch winner-Hessian backward; analytic also wins on exact
    # tables, 32.7 vs 28.0 — reported above as exact_analytic).  Eligible
    # for the headline only if its image passes an allclose gate against
    # the exact-table path on this hardware.
    fused = None
    fused_ok = False
    if backend in ("pallas", "mega") and any(
            g.fused for g in (plan.kernel.groups if plan.kernel else ())):
        fused_cfg = cfg.replace(fused_generators=True,
                                normal_mode="analytic")
        gate_cfg = cfg.replace(width=128, height=128, ray_chunk=0)
        a = np.asarray(render_tables(plan, tables, gate_cfg,
                                     backend=backend))
        b = np.asarray(render_tables(
            plan, tables,
            gate_cfg.replace(fused_generators=True,
                             normal_mode="analytic"),
            backend=backend))
        diff = np.abs(a - b).max(axis=-1)
        fused_ok = bool((diff < 5e-3).mean() > 0.995)
        fused = _measure(plan, tables, fused_cfg, backend)

    # Headline: the faster of the two regimes (fused only when its image
    # passed the gate) — fused+analytic since the single-launch winner
    # backward; the exact regimes ride along in the JSON either way.
    use_fused = (fused_ok and fused
                 and fused["median"] > exact["median"])
    headline = fused["median"] if use_fused else exact["median"]
    tag = f"{backend}_fused" if use_fused else backend

    def rounded(d):
        return {k: (round(v, 4) if isinstance(v, float) else
                    ({kk: round(vv, 4) for kk, vv in v.items()}
                     if isinstance(v, dict) else v))
                for k, v in d.items()}

    record = {
        "metric": f"mrays_per_s_fwd_bwd_menger512_ssaa2_{tag}",
        "value": round(headline, 4),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(headline / BASELINE_MRAYS, 2),
        "timing_protocol": "pipelined x8 dispatches, one sync fetch "
                           "(per_dispatch = r1/r2-comparable, includes "
                           "the tunnel round trip)",
        "roundtrip_floor_s": round(_roundtrip_floor(), 4),
        "exact_mrays": round(exact["median"], 4),
        "exact_vs_baseline": round(exact["median"] / BASELINE_MRAYS, 2),
        "exact_stats": rounded(exact),
        "exact_analytic_mrays": round(exact_analytic["median"], 4),
        "exact_analytic_stats": rounded(exact_analytic),
    }
    if fused is not None:
        record["fused_mrays"] = round(fused["median"], 4)
        record["fused_gate_ok"] = fused_ok
        record["fused_normal_mode"] = "analytic"
        record["fused_stats"] = rounded(fused)
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
