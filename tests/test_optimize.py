"""Scene fitting (optimize.fit) + checkpoint/resume round-trips."""

import numpy as np
import pytest

from raymarching_tpu import RenderConfig
from raymarching_tpu.api import render_tables
from raymarching_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from raymarching_tpu.optimize import fit
from raymarching_tpu.scene.compile import compile_tree
from raymarching_tpu.scene.csg import ListNode, Mode, Sphere, bounds
from raymarching_tpu.scene.objects import Camera, Light

CFG = RenderConfig(width=24, height=16, ssaa=1, iterations=80,
                   shadows=False, normal_mode="analytic")


def _world(dx=0.0):
    tree = ListNode(Mode.UNION, [
        bounds(60.0),
        Sphere((dx, 0.0, -6.0), 2.0, color=(0.9, 0.4, 0.2)),
    ])
    return compile_tree(tree, [Light((6.0, 8.0, 4.0))],
                        Camera(position=(0, 0, 6), fov=55.0))


def test_fit_recovers_sphere_shift():
    plan, tables0 = _world(0.0)
    _, tables_target = _world(0.35)
    target = render_tables(plan, tables_target, CFG, backend="jnp")

    res = fit(plan, tables0, target, CFG, steps=40, lr=3e-2, backend="jnp",
              trainable=("prim_pos",))
    assert res.losses[-1] < res.losses[0] * 0.5
    fitted_dx = float(np.asarray(res.tables.prim_pos)[1, 0])
    assert abs(fitted_dx - 0.35) < 0.1


def test_checkpoint_roundtrip(tmp_path):
    _, tables = _world(1.25)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, tables, step=7, extra={"loss": 0.125})
    loaded, step, extra = load_checkpoint(path)
    assert step == 7
    assert float(extra["loss"]) == 0.125
    for k, v in tables._asdict().items():
        np.testing.assert_array_equal(np.asarray(getattr(loaded, k)),
                                      np.asarray(v))


def test_fit_resume(tmp_path):
    plan, tables0 = _world(0.0)
    _, tables_target = _world(0.3)
    target = render_tables(plan, tables_target, CFG, backend="jnp")
    path = str(tmp_path / "fit.npz")

    fit(plan, tables0, target, CFG, steps=10, lr=2e-2, backend="jnp",
        trainable=("prim_pos",), checkpoint_path=path, checkpoint_every=5)
    _, step, _ = load_checkpoint(path)
    assert step == 10
    # resume continues from the checkpoint step
    res = fit(plan, tables0, target, CFG, steps=14, lr=2e-2, backend="jnp",
              trainable=("prim_pos",), checkpoint_path=path, resume=True)
    assert res.steps == 4


def test_fit_resume_restores_optimizer_state(tmp_path):
    """Resuming an Adam run must continue the SAME optimization trajectory:
    a 6+6-step run with a checkpoint/restart in the middle lands on the
    same parameters as an uninterrupted 12-step run."""
    plan, tables0 = _world(0.0)
    _, tables_target = _world(0.3)
    target = render_tables(plan, tables_target, CFG, backend="jnp")
    path = str(tmp_path / "fit.npz")

    full = fit(plan, tables0, target, CFG, steps=12, lr=2e-2, backend="jnp",
               trainable=("prim_pos",))
    fit(plan, tables0, target, CFG, steps=6, lr=2e-2, backend="jnp",
        trainable=("prim_pos",), checkpoint_path=path, checkpoint_every=100)
    resumed = fit(plan, tables0, target, CFG, steps=12, lr=2e-2,
                  backend="jnp", trainable=("prim_pos",),
                  checkpoint_path=path, resume=True)
    np.testing.assert_allclose(np.asarray(resumed.tables.prim_pos),
                               np.asarray(full.tables.prim_pos),
                               rtol=0, atol=1e-6)


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from raymarching_tpu.io.checkpoint import (load_checkpoint_orbax,
                                               save_checkpoint_orbax)

    _, tables = _world(0.5)
    path = str(tmp_path / "orbax_ck")
    save_checkpoint_orbax(path, tables, step=9)
    loaded, step = load_checkpoint_orbax(path)
    assert step == 9
    np.testing.assert_array_equal(np.asarray(loaded.prim_pos),
                                  np.asarray(tables.prim_pos))
