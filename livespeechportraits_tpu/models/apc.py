"""APC (Autoregressive Predictive Coding) speech encoder.

Capability parity with the reference's frozen pretrained encoder
(models/networks.py:20-69): a stack of unidirectional GRU layers
(80-mel -> hidden, then hidden -> hidden), optional residual connections
between layers when dimensions match, returning the top layer's hidden
sequence.

TPU design: each GRU layer precomputes its input projection as one batched
[B*T, I] x [I, 3H] matmul (MXU), with only the [H, 3H] recurrence inside
lax.scan.  The whole encoder is a single jit; the reference's
pack/pad_packed_sequence machinery is unnecessary because inference runs on
one full-length utterance (demo.py:187-191 always passes the full length).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from livespeechportraits_tpu.config import APCConfig
from livespeechportraits_tpu.models import nn_core


def init_apc(key: jax.Array, cfg: APCConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_layers)
    layers = []
    in_dim = cfg.mel_dim
    for i in range(cfg.num_layers):
        layers.append(nn_core.gru_layer_init(keys[i], in_dim, cfg.hidden_size))
        in_dim = cfg.hidden_size
    return {"layers": layers}


def apply_apc(params: Dict[str, Any], mels: jnp.ndarray, residual: bool = False) -> jnp.ndarray:
    """[B, T, mel_dim] -> [B, T, hidden] (top-layer GRU states).

    Residual adds the layer input when shapes match (networks.py:63-65,
    i.e. between hidden-sized layers only).
    """
    x = mels
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        y, _ = nn_core.gru_layer(layer, x)
        if i + 1 < n and residual and x.shape[-1] == y.shape[-1]:
            y = y + x
        x = y
    return x


@functools.partial(jax.jit, static_argnames=("residual",))
def encode(params: Dict[str, Any], mels: jnp.ndarray,
           residual: bool = False) -> jnp.ndarray:
    """Frozen-encoder entry point.  `residual` MUST match the flag the
    encoder was trained with (cfg.apc.residual; the released subject
    configs all set residual: false) - serving a residual-trained encoder
    without the adds silently produces wrong features."""
    return apply_apc(params, mels, residual=residual)


def init_apc_pretrain(key: jax.Array, cfg: APCConfig) -> Dict[str, Any]:
    """Encoder + linear prediction head for self-supervised pretraining.

    The reference ships only the *result* of APC pretraining (a frozen
    .model file loaded at demo.py:145-160) and no way to produce one; in
    a zero-egress deployment that leaves the whole audio front-end
    unusable.  This head + `make_apc_step` close the gap: predict the
    log-mel frame `cfg.time_shift` steps ahead from the GRU state
    (L1 loss), then serve `params["encoder"]` as the frozen encoder.
    """
    ke, kh = jax.random.split(key)
    return {
        "encoder": init_apc(ke, cfg),
        "head": nn_core.dense_init(kh, cfg.hidden_size, cfg.mel_dim,
                                   init="xavier", gain=1.0),
    }


def apply_apc_pretrain(params: Dict[str, Any], mels: jnp.ndarray,
                       residual: bool = False) -> jnp.ndarray:
    """[B, T, mel] -> [B, T, mel] predicted future frames (row t predicts
    input row t + time_shift; the loss alignment lives in the step)."""
    h = apply_apc(params["encoder"], mels, residual=residual)
    return nn_core.dense(params["head"], h)


def load_pretrained_encoder(ckpt_dir: str, cfg: APCConfig, step=None) -> Dict[str, Any]:
    """Restore the encoder subtree from a `train_apc` orbax checkpoint
    directory (the pretrain head is dropped - it only exists to give the
    encoder a training signal)."""
    from livespeechportraits_tpu.utils import checkpoint as ckpt_mod

    if step is None:
        ckpt_dir = ckpt_mod.prefer_best(ckpt_dir)
    raw = ckpt_mod.restore_checkpoint(ckpt_dir, step)
    tmpl = init_apc_pretrain(jax.random.PRNGKey(0), cfg)
    return ckpt_mod.rebuild(tmpl, raw["params"])["encoder"]


def encode_fast(params: Dict[str, Any], mels: jnp.ndarray,
                residual: bool = False) -> jnp.ndarray:
    """[T, mel] -> [T, H]: the batch-1 inference path, routed through the
    VMEM-resident Pallas recurrence kernel on TPU (~2x the XLA scan;
    ops/recurrent_pallas.py) with the scan fallback elsewhere.  A
    residual-trained encoder (cfg.apc.residual) takes the scan path -
    the Pallas kernel has no residual form."""
    from livespeechportraits_tpu.ops import recurrent_pallas as rp

    if rp.supports_pallas() and not residual:
        return rp.apc_encode_pallas(params, mels)
    return encode(params, mels[None], residual=residual)[0]
