"""Checkpoint / resume for scene-parameter pytrees.

The reference has no checkpointing at all (outputs are final images only,
SURVEY §5); for the differentiable-optimization use case we persist the
``SceneTables`` pytree plus optimizer state.  Format: a plain ``.npz``
(portable, dependency-free); ``orbax`` is used when available for
multi-host-safe atomic writes.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional, Tuple

import numpy as np

from ..scene.compile import SceneTables


def save_checkpoint_orbax(path: str, tables: SceneTables, *,
                          step: int = 0) -> None:
    """Orbax-backed checkpoint (multi-host-safe atomic writes); requires
    orbax-checkpoint.  For single-host use, ``save_checkpoint`` (npz) is
    equivalent and dependency-free."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path),
               {"tables": tables._asdict(), "step": np.asarray(step)},
               force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str):
    """-> (tables, step) from an orbax checkpoint."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(path))
    return SceneTables(**state["tables"]), int(state["step"])


def save_checkpoint(path: str, tables: SceneTables, *, step: int = 0,
                    extra: Optional[dict] = None) -> None:
    """Atomically write tables (+ scalars in ``extra``) to ``path``."""
    arrays = {f"tables.{k}": np.asarray(v)
              for k, v in tables._asdict().items()}
    arrays["step"] = np.asarray(step)
    for k, v in (extra or {}).items():
        arrays[f"extra.{k}"] = np.asarray(v)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str) -> Tuple[SceneTables, int, dict]:
    """-> (tables, step, extra)."""
    with np.load(path) as z:
        fields = {}
        extra = {}
        step = 0
        for k in z.files:
            if k == "step":
                step = int(z[k])
            elif k.startswith("tables."):
                fields[k[len("tables."):]] = z[k]
            elif k.startswith("extra."):
                extra[k[len("extra."):]] = z[k]
    return SceneTables(**fields), step, extra
