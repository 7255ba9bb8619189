"""Benchmark: Mrays/s/chip, forward+backward, MengerSponge scene.

Workload (BASELINE.json north star): the demo scene (MengerSponge iters=3 +
DeathStar + 2 spheres + floor + bounds, 2 lights — 428 primitives) at
512x512, SSAA 2x2, 1000 march iterations, hard shadows: one forward render
fused with a full backward sweep (gradients to every scene parameter).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The fwd+bwd regimes measured and reported every run:

  * ``exact_mrays``  — exact reference-table semantics (the apples-to-apples
    number against the reference's own math);
  * ``exact_analytic_mrays`` — exact tables + analytic winner-gradient
    normals (same field, a.e.-equal estimator; ~1.3x faster than FD via
    the single-launch winner-Hessian backward, ab_analytic_r3.json +
    the r4 gather sweep) —
    the exact headline stays FD because its claim is bit-parity with the
    reference's own estimator (scene.cpp:70-89);
  * ``fused_mrays``  — the opt-in space-folded Menger mode (same zero set,
    conservative distances) with in-kernel analytic normals (faster
    than FD on the folded field via the single-launch winner-Hessian
    backward; ab_analytic_r3.json + r4 gather sweep); enabled for the headline only if its
    image passes an on-hardware allclose gate against the exact path AT
    THE HEADLINE FOOTPRINT (512² SSAA2 — gate stats ride in the JSON).

Forward-only serving regimes (the reference's own protocol — its 0.038
Mrays/s GTX 1060 baseline never computes a gradient, main.cpp:69-77):

  * ``forward_exact_mrays`` — exact semantics, FD normals, black-lane
    shadow skip engaged (bit-identical image; forward-only by design);
  * ``forward_mrays`` — the fused+analytic serving fast path (gated by the
    same headline-footprint gate).

The headline ``value`` is the fused fwd+bwd number when the gate passes,
else the exact number; every other regime rides along in the same JSON
object.  ``vs_baseline`` is against the reference's best published number:
its GL compute shader renders 1024x768 SSAA 3x3 in 185.161 s on a GTX 1060
(reference README.md:95) = 0.0382 Mrays/s — forward only; we charge the
headline forward+backward and still compare against it
(``forward_vs_baseline`` is the apples-to-apples forward multiple).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MRAYS = 7.0778880e6 / 185.161 / 1e6  # 0.03822 Mrays/s (GTX 1060)

# Pipelined reps are sized to this much wall-clock each (tunnel jitter of a
# few ms then stays well under 1% of the measurement): r3's fixed depth 8
# gave the fused regime 0.75% spread but the slower exact regime 5.5% —
# too noisy to gate a 10% optimization (r3 verdict weak #5).
_TARGET_REP_S = 1.2
_MAX_PIPELINE = 64


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


def _stats(rates):
    rates = np.asarray(rates)
    return {
        "median": float(np.median(rates)),
        "min": float(rates.min()),
        "max": float(rates.max()),
        "spread_pct": float(100.0 * (rates.max() - rates.min())
                            / np.median(rates)),
        "reps": int(len(rates)),
    }


def _measure(plan, tables, cfg, backend, reps=5, forward_only=False,
             ray_perm=None):
    """Throughput stats under TWO protocols:

    * ``pipelined`` (the headline): N back-to-back dispatches of the step
      with ONE host fetch of the last scalar.  The device stream is FIFO,
      so the fetch proves all executed; the ~30 ms tunnel round trip
      amortizes away.  This is what a production host (PCIe-attached, not
      fetching scalars over HTTP per step) sees.  N adapts per regime so
      every rep runs ~_TARGET_REP_S of device time — a fixed depth left
      the slow exact regime at 5.5% spread while fused sat at 0.75%.
    * ``per_dispatch``: one fetch per rep — comparable to the r1/r2
      records, which unknowingly included the round trip (~26% at these
      frame times).

    ``forward_only`` measures the primal render (the serving protocol —
    no gradient is traced, so the black-lane shadow skip stays engaged);
    the frame reduces to one in-graph scalar so the timing fetch ships
    4 bytes, not a 3 MB image.

    Every rep is timed individually IN THIS PROCESS and min/median/max
    reported: a regression is only credible when it exceeds the spread
    (same-commit cross-process swings of ~9% are documented)."""
    from raymarching_tpu.api import render_tables

    def loss_fn(t):
        img = render_tables(plan, t, cfg, backend=backend,
                            ray_perm=ray_perm)
        return jnp.mean(img)

    if forward_only:
        step = jax.jit(lambda t: (loss_fn(t),))
    else:
        step = jax.jit(jax.value_and_grad(loss_fn))

    # compile + warm + correctness gate (fetch everything once)
    out = step(tables)
    loss = float(out[0])
    assert loss > 0, "degenerate render"
    if not forward_only:
        g = np.asarray(out[1].prim_pos)
        assert np.all(np.isfinite(g)), "non-finite gradients"

    per_dispatch = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = step(tables)
        float(out[0])
        if not forward_only:
            np.asarray(out[1].prim_pos)
        per_dispatch.append(
            cfg.rays_per_image / (time.perf_counter() - t0) / 1e6)

    # pilot pipelined rep at depth 8 sizes the real depth for this regime
    def one_pipelined(depth):
        t0 = time.perf_counter()
        for _i in range(depth):
            out = step(tables)
        float(out[0])        # one fetch syncs the whole FIFO queue
        return depth * cfg.rays_per_image / (time.perf_counter() - t0) / 1e6

    pilot = one_pipelined(8)
    frame_s = cfg.rays_per_image / (pilot * 1e6)
    pipeline = int(np.clip(round(_TARGET_REP_S / max(frame_s, 1e-6)),
                           8, _MAX_PIPELINE))
    pipelined = [one_pipelined(pipeline) for _ in range(reps)]

    # The HTTP tunnel occasionally stalls a single fetch for seconds
    # (observed: one rep at 0.32 Mrays/s amid four at 50.9 — a 160x
    # outlier no device behavior can produce).  Re-run reps that deviate
    # >20% from the median ONCE; if the deviation persists it is real and
    # stays in the record.  ``reruns`` counts how many were re-measured.
    med = float(np.median(pipelined))
    reruns = 0
    for i, r in enumerate(pipelined):
        if abs(r - med) > 0.2 * med:
            pipelined[i] = one_pipelined(pipeline)
            reruns += 1

    rec = _stats(pipelined)
    rec["per_dispatch"] = _stats(per_dispatch)
    rec["pipeline_depth"] = int(pipeline)
    if reruns:
        rec["tunnel_outlier_reruns"] = reruns
    return rec


def _fused_gate(plan, tables, cfg, backend):
    """Allclose gate for the fused approximation AT THE HEADLINE FOOTPRINT
    (512² SSAA2, same chunking as the measured workload — r3 gated at a
    reduced 128² render the bench never measured): one full-frame render
    per regime, full-image fetch (3 MB once, not per rep), worst pixel
    recorded.  Returns (ok, stats)."""
    from raymarching_tpu.api import render_tables

    from raymarching_tpu.api import render_aovs
    from raymarching_tpu.utils.gatecheck import classify_offenders

    exact = jax.jit(lambda t: render_tables(plan, t, cfg, backend=backend))
    fcfg = cfg.replace(fused_generators=True, normal_mode="analytic")
    fused = jax.jit(lambda t: render_tables(plan, t, fcfg, backend=backend))
    a = np.asarray(exact(tables))
    b = np.asarray(fused(tables))
    diff = np.abs(a - b).max(axis=-1)
    thresh = 5e-3
    frac = float((diff < thresh).mean())
    wy, wx = np.unravel_index(int(diff.argmax()), diff.shape)
    stats = {
        "gate_resolution": f"{cfg.width}x{cfg.height}_ssaa{cfg.ssaa}",
        "gate_threshold": thresh,
        "gate_frac_within": round(frac, 6),
        "gate_max_diff": round(float(diff.max()), 6),
        "gate_worst_pixel_yx": [int(wy), int(wx)],
        "gate_pixels_over": int((diff >= thresh).sum()),
    }
    # Classify every offender against the exact render's own geometry
    # (r5 verdict #5): a fused-vs-exact mismatch is benign only when it
    # sits on a silhouette/depth discontinuity (fold-association ulps
    # flipping a marginal SSAA sample); an interior offender is a bug.
    if stats["gate_pixels_over"]:
        aovs = jax.jit(lambda t: render_aovs(plan, t, cfg,
                                             interpret=False))(tables)
        cls = classify_offenders(diff, thresh,
                                 np.asarray(aovs["objid"]),
                                 np.asarray(aovs["depth"]),
                                 np.asarray(aovs["hit"]),
                                 shadow=np.asarray(aovs["shadow"]),
                                 normal=np.asarray(aovs["normal"]))
        # BOOL all-clear + separate count: a mixed bool/int field reads
        # a nonzero count as truthy all-clear (r5 review finding)
        stats["gate_offenders_on_silhouette"] = cls["all_on_silhouette"]
        stats["gate_offenders_on_silhouette_count"] = \
            cls["offenders_on_silhouette"]
        stats["gate_offenders_interior"] = cls["offenders_interior"]
        if cls["interior_yx"]:
            stats["gate_interior_yx"] = cls["interior_yx"]
    else:
        stats["gate_offenders_on_silhouette"] = True
        stats["gate_offenders_on_silhouette_count"] = 0
        stats["gate_offenders_interior"] = 0
    return frac > 0.995, stats


def _serve_gate(plan, tables, cfg, backend):
    """Allclose gate for the in-kernel raygen serving path
    (RenderConfig.serve_raygen) at the headline footprint: the kernel's
    own direction math vs the standard jnp raygen differ only by ulps
    (same formulas, different fusion), so the images must agree
    essentially everywhere.  Returns (ok, stats)."""
    from raymarching_tpu.api import render_tables

    if backend not in ("pallas", "mega"):
        return False, {}
    std = jax.jit(lambda t: render_tables(plan, t, cfg, backend=backend))
    scfg = cfg.replace(serve_raygen=True)
    srv = jax.jit(lambda t: render_tables(plan, t, scfg, backend=backend))
    a = np.asarray(std(tables))
    b = np.asarray(srv(tables))
    diff = np.abs(a - b).max(axis=-1)
    thresh = 5e-3
    frac = float((diff < thresh).mean())
    stats = {
        "serve_gate_frac_within": round(frac, 6),
        "serve_gate_max_diff": round(float(diff.max()), 6),
    }
    return frac > 0.995, stats


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
    from raymarching_tpu.api import resolve_backend

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

    has_fused = backend in ("pallas", "mega") and any(
        g.fused for g in (plan.kernel.groups if plan.kernel else ()))

    # Gate first (compiles + validates the two forward paths the serving
    # regimes reuse), at the exact footprint the bench measures.
    fused_ok, gate_stats = (False, {})
    if has_fused:
        fused_ok, gate_stats = _fused_gate(plan, tables, cfg, backend)

    # Forward-only serving regimes (the reference's own protocol): exact
    # semantics, and the gated fused fast path.  The black-lane shadow
    # skip stays engaged here — it is forward-only by design (the
    # custom-vjp fwd rule disables it whenever a gradient is traced) —
    # and so is the in-kernel raygen (RenderConfig.serve_raygen), gated
    # PER REGIME against the standard-raygen render of the SAME regime
    # (the fused+analytic+serve combination gets its own on-hardware
    # gate, not a transfer of the exact regime's).
    fcfg = cfg.replace(fused_generators=True, normal_mode="analytic")
    serve_ok, serve_stats = _serve_gate(plan, tables, cfg, backend)
    fwd_exact = _measure(plan, tables,
                         cfg.replace(serve_raygen=serve_ok),
                         backend, forward_only=True)
    fwd_fused = None
    if has_fused:
        serve_fused_ok, s2 = _serve_gate(plan, tables, fcfg, backend)
        serve_stats = dict(serve_stats)
        serve_stats.update({"serve_fused_" + k.removeprefix("serve_"): v
                            for k, v in s2.items()})
        serve_ok = serve_ok and serve_fused_ok
        fwd_fused = _measure(
            plan, tables, fcfg.replace(serve_raygen=serve_fused_ok),
            backend, forward_only=True)

    exact = _measure(plan, tables, cfg, backend)

    # Informational third regime: exact tables + analytic winner-gradient
    # normals (~1.3x faster than FD, see module docstring).
    exact_analytic = _measure(plan, tables,
                              cfg.replace(normal_mode="analytic"), backend)

    # Fused-generator fast mode with ANALYTIC normals (2.2x faster than FD
    # on the folded field via the single-launch winner-Hessian backward;
    # ab_analytic_r3.json).  Eligible for the headline only when the
    # headline-footprint gate above passed.
    fused = _measure(plan, tables,
                     cfg.replace(fused_generators=True,
                                 normal_mode="analytic"),
                     backend) if has_fused else None

    # Headline: the faster of the two regimes (fused only when its image
    # passed the gate) — the exact regimes ride along in the JSON either way.
    use_fused = (fused_ok and fused
                 and fused["median"] > exact["median"])
    headline = fused["median"] if use_fused else exact["median"]
    tag = f"{backend}_fused" if use_fused else backend

    def rounded(d):
        return {k: (round(v, 4) if isinstance(v, float) else
                    ({kk: round(vv, 4) for kk, vv in v.items()}
                     if isinstance(v, dict) else v))
                for k, v in d.items()}

    fwd_serving = (fwd_fused if (fused_ok and fwd_fused
                                 and fwd_fused["median"]
                                 > fwd_exact["median"])
                   else fwd_exact)
    record = {
        "metric": f"mrays_per_s_fwd_bwd_menger512_ssaa2_{tag}",
        "value": round(headline, 4),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(headline / BASELINE_MRAYS, 2),
        "timing_protocol": "pipelined (adaptive depth, ~1.2 s/rep), one "
                           "sync fetch (per_dispatch = r1/r2-comparable, "
                           "includes the tunnel round trip)",
        "roundtrip_floor_s": round(_roundtrip_floor(), 4),
        "exact_mrays": round(exact["median"], 4),
        "exact_vs_baseline": round(exact["median"] / BASELINE_MRAYS, 2),
        "exact_stats": rounded(exact),
        "exact_analytic_mrays": round(exact_analytic["median"], 4),
        "exact_analytic_stats": rounded(exact_analytic),
        "forward_mrays": round(fwd_serving["median"], 4),
        "forward_vs_baseline": round(fwd_serving["median"] / BASELINE_MRAYS,
                                     2),
        "forward_regime": ("fused_analytic" if fwd_serving is fwd_fused
                           else "exact_fd"),
        "forward_stats": rounded(fwd_serving),
        "forward_exact_mrays": round(fwd_exact["median"], 4),
        "forward_exact_stats": rounded(fwd_exact),
        "serve_raygen": serve_ok,
    }
    record.update(serve_stats)
    if fused is not None:
        record["fused_mrays"] = round(fused["median"], 4)
        record["fused_gate_ok"] = fused_ok
        record["fused_normal_mode"] = "analytic"
        record["fused_stats"] = rounded(fused)
        record.update(gate_stats)
        if fwd_fused is not None:
            record["forward_fused_mrays"] = round(fwd_fused["median"], 4)

    # The driver captures a bounded TAIL of stdout and parses the last
    # line — r4's full record (~2.3 kB) overflowed it and BENCH_r04.json
    # recorded "parsed": null (r5 verdict #7).  The FINAL stdout line is
    # now a compact record (well under the tail window); the full record
    # goes to stderr and to bench_details.json beside this script.
    details_path = os.path.join(here, "bench_details.json")
    with open(details_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record), file=sys.stderr)
    compact = {k: record[k] for k in (
        "metric", "value", "unit", "vs_baseline", "exact_mrays",
        "exact_analytic_mrays", "forward_mrays", "forward_vs_baseline",
        "forward_exact_mrays") if k in record}
    for k in ("fused_mrays", "fused_gate_ok", "gate_frac_within",
              "gate_max_diff", "gate_pixels_over",
              "gate_offenders_on_silhouette", "gate_offenders_interior",
              "serve_raygen"):
        if k in record:
            compact[k] = record[k]
    compact["spread_pct"] = (record.get("fused_stats") or
                             record["exact_stats"])["spread_pct"]
    compact["details"] = "bench_details.json"
    print(json.dumps(compact))


if __name__ == "__main__":
    sys.exit(main())
