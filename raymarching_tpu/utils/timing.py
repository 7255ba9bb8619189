"""Phase timers and throughput reporting.

The reference's entire observability story is chrono spans printed per
backend (main.cpp:36-77).  This keeps that ergonomic (wall-clock per phase)
and adds the metric that matters on TPU: Mrays/s, plus optional
jax.profiler trace capture.

NOTE: on tunneled TPU platforms ``block_until_ready`` can return before
device work completes; ``Phase`` therefore synchronizes by fetching a
designated result to host, which is always truthful.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


def _on_tunneled_platform() -> bool:
    """True when the device is reached through a remote tunnel (the axon
    PJRT plugin), where ``block_until_ready`` returns before device work
    completes and only a host fetch is a truthful sync."""
    try:
        import jax
        if "axon" in (jax.config.jax_platforms or ""):
            d = jax.devices()[0]
            return "axon" in getattr(d.client, "platform_version", "")
    except Exception:
        pass
    return False


class Phase:
    """Wall-clock span: ``with Phase("render") as ph: ... ph.sync(x)``.

    A throughput-reporting phase (``rays`` given) REQUIRES ``sync``: on a
    tunneled platform an un-synced exit raises rather than print a rate
    computed from a timestamp the device never confirmed (the
    block_until_ready footgun)."""

    def __init__(self, name: str, rays: Optional[int] = None,
                 verbose: bool = True):
        self.name = name
        self.rays = rays
        self.verbose = verbose
        self.seconds = None
        self._synced = False

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def sync(self, value):
        """Force the value to host (true device sync) and return it."""
        out = jax_tree_fetch(value)
        self._synced = True
        return out

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        if (exc[0] is None and self.rays and not self._synced
                and _on_tunneled_platform()):
            raise RuntimeError(
                f"Phase({self.name!r}) reports a throughput but never "
                "called .sync(result): on this tunneled platform the "
                "timing is not trustworthy without a host fetch")
        if self.verbose and exc[0] is None:
            msg = f"[{self.name}] {self.seconds:.3f} s"
            if self.rays:
                msg += f"  ({self.rays / self.seconds / 1e6:.3f} Mrays/s)"
            print(msg)
        return False


def jax_tree_fetch(value):
    """Fetch every array leaf of ``value`` to host memory (numpy) — the
    only device synchronization that is truthful on every platform."""
    if isinstance(value, (list, tuple, dict)):
        import jax
        return jax.tree_util.tree_map(np.asarray, value)
    return np.asarray(value)


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """Capture a jax.profiler trace when a logdir is given."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def march_iteration_stats(converged: np.ndarray,
                          steps: Optional[np.ndarray] = None) -> dict:
    """Convergence summary for observability (SURVEY §5 metrics row)."""
    converged = np.asarray(converged)
    out = {
        "rays": int(converged.size),
        "converged": int(converged.sum()),
        "miss_fraction": float(1.0 - converged.mean()) if converged.size
        else 0.0,
    }
    if steps is not None:
        steps = np.asarray(steps)
        out["steps"] = {
            "mean": float(steps.mean()),
            "p50": int(np.percentile(steps, 50)),
            "p90": int(np.percentile(steps, 90)),
            "p99": int(np.percentile(steps, 99)),
            "max": int(steps.max()),
        }
    return out


def profile_march(plan, tables, cfg, backend: str = "jnp") -> dict:
    """Render-shaped march profile: convergence + step histogram for the
    primary rays of ``cfg``'s camera.

    ``backend``: "jnp" (anywhere) or "pallas" (the real kernel's counters,
    incl. the per-tile early-exit and culling behaviour on hardware)."""
    import jax
    import jax.numpy as jnp

    from ..core import camera as cam

    origin, dirs = cam.generate_rays(tables, cfg)
    dirs = jnp.reshape(dirs, (-1, 3))
    o = np.broadcast_to(np.asarray(origin), dirs.shape)

    if backend == "pallas":
        from ..ops.pallas_march import pallas_march

        res, steps = jax.jit(lambda oo, dd, tb: pallas_march(
            plan.kernel, cfg.iterations, cfg.surface_precision,
            cfg.tile_sublanes, oo, dd, tb,
            fused=cfg.fused_generators, with_steps=True))(o, dirs, tables)
    else:
        from ..core.march import march_profile
        from ..core.sdf import scene_sd

        res, steps = jax.jit(lambda oo, dd: march_profile(
            lambda p: scene_sd(plan, tables, p), oo, dd,
            cfg.iterations, cfg.surface_precision))(o, dirs)
    return march_iteration_stats(np.asarray(res.converged),
                                 np.asarray(steps))
