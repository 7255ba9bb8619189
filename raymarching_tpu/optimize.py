"""Differentiable scene optimization: fit scene parameters to target images.

The north-star use case the reference could never support: because every
stage of the renderer is differentiable (implicit-function backward through
the march, subgradients through the CSG min/max folds, clamp/boolean
handling matching what autodiff of the reference's math would produce),
``fit`` runs gradient descent on any subset of SceneTables — primitive
positions/sizes/colors, light positions, full camera pose — against a
photometric target.

Works single-chip or ray-sharded over a mesh (gradients psum over ICI), with
checkpoint/resume via io.checkpoint.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .api import render_tables
from .config import RenderConfig
from .io.checkpoint import load_checkpoint, save_checkpoint
from .scene.compile import ScenePlan, SceneTables


@dataclasses.dataclass
class FitResult:
    tables: SceneTables
    losses: list
    steps: int


def _masked_updates(grads: SceneTables, trainable: Optional[Sequence[str]]):
    if trainable is None:
        return grads
    keep = set(trainable)
    return SceneTables(**{
        k: (v if k in keep else jnp.zeros_like(v))
        for k, v in grads._asdict().items()})


def fit(plan: ScenePlan, tables: SceneTables, target: jnp.ndarray,
        cfg: RenderConfig, *, steps: int = 100, lr: float = 1e-2,
        backend: str = "auto", trainable: Optional[Sequence[str]] = None,
        optimizer: Optional[optax.GradientTransformation] = None,
        mesh=None, checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 50, resume: bool = False,
        callback: Optional[Callable] = None) -> FitResult:
    """Minimize mean squared photometric error against ``target`` [H, W, 3].

    ``trainable``: field names of SceneTables to optimize (None = all).
    ``mesh``: a jax mesh to ray-shard the loss over (parallel.sharded).
    """
    opt = optimizer or optax.adam(lr)
    target = jnp.asarray(target, jnp.float32)

    start_step = 0
    if resume and checkpoint_path:
        import os
        if os.path.exists(checkpoint_path):
            tables, start_step, _ = load_checkpoint(checkpoint_path)
            tables = jax.tree_util.tree_map(jnp.asarray, tables)

    if mesh is not None:
        from .parallel.sharded import mse_loss

        def loss_fn(t):
            return mse_loss(plan, t, target, cfg, mesh, backend=backend)
    else:
        def loss_fn(t):
            img = render_tables(plan, t, cfg, backend=backend,
                                differentiable=True)
            return jnp.mean((img - target) ** 2)

    @jax.jit
    def step_fn(t, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(t)
        grads = _masked_updates(grads, trainable)
        updates, opt_state = opt.update(grads, opt_state, t)
        return loss, optax.apply_updates(t, updates), opt_state

    opt_state = opt.init(tables)
    losses = []
    for step in range(start_step, steps):
        loss, tables, opt_state = step_fn(tables, opt_state)
        losses.append(float(loss))
        if callback is not None:
            callback(step, losses[-1], tables)
        if checkpoint_path and (step + 1) % checkpoint_every == 0:
            save_checkpoint(checkpoint_path, jax.device_get(tables),
                            step=step + 1)
    if checkpoint_path:
        save_checkpoint(checkpoint_path, jax.device_get(tables), step=steps)
    return FitResult(tables=tables, losses=losses, steps=steps - start_step)
