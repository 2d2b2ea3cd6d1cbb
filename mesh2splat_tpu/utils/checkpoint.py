"""Checkpoint / resume.

The reference's "checkpoints" are the PLY files themselves (SURVEY.md
section 5): export = 3 binary formats, import restores renderable state. This
module keeps that contract (io/ply.py is the interchange layer) and adds
orbax checkpoints for the *differentiable* state the reference doesn't have:
splat params + optimizer state + step counter, resumable mid-training.
"""

from __future__ import annotations

import pathlib

import jax


def save_training_state(path, params, opt_state, step: int):
    """Orbax-backed checkpoint of a training run."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(
        path,
        {
            "params": params,
            "opt_state": opt_state,
            "step": jax.numpy.asarray(step),
        },
        force=True,
    )
    ckpt.wait_until_finished()


def load_training_state(path, params_like, opt_state_like):
    """Restore (params, opt_state, step); *_like provide pytree structure."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    ckpt = ocp.StandardCheckpointer()
    target = {
        "params": params_like,
        "opt_state": opt_state_like,
        "step": jnp.asarray(0),
    }
    restored = ckpt.restore(path, target)
    return restored["params"], restored["opt_state"], int(restored["step"])
