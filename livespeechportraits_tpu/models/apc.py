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


@jax.jit
def encode(params: Dict[str, Any], mels: jnp.ndarray) -> jnp.ndarray:
    """Frozen-encoder entry point (no residual - the released subject
    configs all set residual: false)."""
    return apply_apc(params, mels, residual=False)


def encode_fast(params: Dict[str, Any], mels: jnp.ndarray) -> jnp.ndarray:
    """[T, mel] -> [T, H]: the batch-1 inference path, routed through the
    VMEM-resident Pallas recurrence kernel on TPU (~2x the XLA scan;
    ops/recurrent_pallas.py) with the scan fallback elsewhere."""
    from livespeechportraits_tpu.ops import recurrent_pallas as rp

    if rp.supports_pallas():
        return rp.apc_encode_pallas(params, mels)
    return encode(params, mels[None])[0]
