"""Train state: (params, opt_state, step) pytrees + batch-norm plumbing.

Replaces the reference's BaseModel checkpoint/optimizer scaffolding
(models/base_model.py) with explicit functional state.  Batch-norm running
stats live inside the params tree; gradients with respect to them are
identically zero in training mode (the forward uses batch statistics), so
after the optimizer update we splice the fresh running stats from the
forward's auxiliary output back in (`merge_bn_stats`).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def create_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def adam(lr: float | optax.Schedule, b1: float = 0.9, b2: float = 0.99,
         eps: float = 1e-8) -> optax.GradientTransformation:
    """The reference's Adam settings: betas (0.9, 0.99) for the audio
    models (audio2feature_model.py:31-32), (0.5, 0.999) or TTUR (0, 0.9)
    for the GAN (feature2face_model.py:45-56)."""
    return optax.adam(lr, b1=b1, b2=b2, eps=eps)


def _is_bn(d: Any) -> bool:
    return isinstance(d, dict) and {"scale", "bias", "mean", "var"} <= set(d.keys())


def merge_bn_stats(params: Any, aux: Any) -> Any:
    """Copy running mean/var from `aux` (the training forward's updated
    params) into `params`, leaving every learned leaf untouched."""
    if _is_bn(params) and _is_bn(aux):
        out = dict(params)
        out["mean"] = aux["mean"]
        out["var"] = aux["var"]
        return out
    if isinstance(params, dict):
        return {k: merge_bn_stats(v, aux[k]) if k in aux else v for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        if len(aux) != len(params):
            raise ValueError(
                f"aux tree sequence length {len(aux)} != params "
                f"{len(params)}: refusing to silently truncate layers")
        t = type(params)
        return t(merge_bn_stats(p, a) for p, a in zip(params, aux))
    return params


def apply_updates_with_bn(state: TrainState, grads, aux_params,
                          tx: optax.GradientTransformation) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_params = merge_bn_stats(new_params, aux_params)
    return TrainState(params=new_params, opt_state=new_opt, step=state.step + 1)
