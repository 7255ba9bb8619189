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
    restored_opt_state = None
    if resume and checkpoint_path:
        import os
        if os.path.exists(checkpoint_path):
            tables, start_step, extra = load_checkpoint(checkpoint_path)
            tables = jax.tree_util.tree_map(jnp.asarray, tables)
            restored_opt_state = _opt_state_from_extra(
                opt.init(tables), extra)

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

    opt_state = (restored_opt_state if restored_opt_state is not None
                 else opt.init(tables))

    def _save(step):
        save_checkpoint(checkpoint_path, jax.device_get(tables), step=step,
                        extra=_opt_state_to_extra(jax.device_get(opt_state)))

    from .utils.structlog import emit

    losses = []
    for step in range(start_step, steps):
        loss, tables, opt_state = step_fn(tables, opt_state)
        losses.append(float(loss))
        emit("fit_step", step=step, loss=losses[-1])
        if callback is not None:
            callback(step, losses[-1], tables)
        if checkpoint_path and (step + 1) % checkpoint_every == 0:
            _save(step + 1)
            emit("checkpoint", step=step + 1, path=checkpoint_path)
    if checkpoint_path:
        _save(steps)
    return FitResult(tables=tables, losses=losses, steps=steps - start_step)


def _opt_state_to_extra(opt_state) -> dict:
    """Flatten an optax state pytree into the checkpoint ``extra`` dict
    (leaves keyed by flattening order; structure is rebuilt from a fresh
    ``opt.init`` on restore, so only leaf values need persisting)."""
    leaves = jax.tree_util.tree_leaves(opt_state)
    return {f"opt_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}


def _opt_state_from_extra(template_state, extra: dict):
    """Rebuild optimizer state from checkpointed leaves; returns None (fresh
    init) when the checkpoint predates opt-state saving or the optimizer's
    structure changed (different leaf count/shape)."""
    keys = sorted((k for k in extra if k.startswith("opt_")),
                  key=lambda k: int(k[4:]))
    if not keys:
        return None
    leaves, treedef = jax.tree_util.tree_flatten(template_state)
    saved = [extra[k] for k in keys]
    if len(saved) != len(leaves) or any(
            np.shape(s) != np.shape(l) for s, l in zip(saved, leaves)):
        return None
    saved = [jnp.asarray(s, jnp.asarray(l).dtype)
             for s, l in zip(saved, leaves)]
    return jax.tree_util.tree_unflatten(treedef, saved)
