"""Pallas TPU kernels for recurrent layers (GRU / LSTM time loops).

XLA lowers `lax.scan` recurrences to one device loop iteration per step
with HBM round-trips for the carried state - fine for long matmuls,
wasteful for the [1, H] x [H, 3H] cell updates of the APC encoder and the
Audio2Feature LSTM (~100 us/step of overhead for ~1 us of math).  These
kernels run the WHOLE time loop inside one pallas_call with everything
VMEM-resident:

* the input projections x @ W_ih + b_ih are precomputed OUTSIDE the kernel
  as one large MXU matmul over the full sequence (same trick as
  models/nn_core.py);
* W_hh (H x 3H/4H), the projected inputs and the output sequence live in
  VMEM for the kernel's lifetime; the hidden state never leaves the chip.

VMEM budget: H=512, T=1200 (10 s of 120 Hz audio) needs ~13 MB - within a
v5e core's ~16 MB.  Longer sequences are chunked by the caller with the
carried state passed between calls (exactness is unaffected; the
recurrence is sequential anyway).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Sequence chunk length per pallas call (VMEM sizing; see module docstring).
CHUNK_T = 1024


def _gru_kernel(xp_ref, whh_ref, bhh_ref, h0_ref, ys_ref, hT_ref):
    """xp: [C, 3H] projected inputs; whh: [H, 3H]; bhh: [1, 3H];
    h0: [1, H] -> ys: [C, H], hT: [1, H]."""
    C = xp_ref.shape[0]
    H = h0_ref.shape[1]

    def step(t, h):
        xp = xp_ref[t, :][None, :]  # [1, 3H]
        hp = jnp.dot(h, whh_ref[:, :], preferred_element_type=jnp.float32) + bhh_ref[0, :][None, :]
        xr = xp[:, :H]
        xz = xp[:, H : 2 * H]
        xn = xp[:, 2 * H :]
        hr = hp[:, :H]
        hz = hp[:, H : 2 * H]
        hn = hp[:, 2 * H :]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1 - z) * n + z * h
        ys_ref[t, :] = h_new[0, :]
        return h_new

    h = jax.lax.fori_loop(0, C, step, h0_ref[:, :])
    hT_ref[0, :] = h[0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gru_chunk_call(x_proj: jnp.ndarray, w_hh: jnp.ndarray, b_hh: jnp.ndarray,
                    h0: jnp.ndarray, interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    C, threeH = x_proj.shape
    H = w_hh.shape[0]
    ys, hT = pl.pallas_call(
        _gru_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x_proj, w_hh, b_hh, h0)
    return ys, hT


def gru_layer_pallas(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
                     h0: jnp.ndarray | None = None,
                     interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for nn_core.gru_layer on a single sequence.

    x: [1, T, I] (batch 1 - the pipeline's inference shape) -> ([1, T, H], h_T).
    """
    assert x.shape[0] == 1, "pallas GRU path is for the batch-1 inference shape"
    T = x.shape[1]
    H = params["w_hh"].shape[0]
    x_proj = (x[0] @ params["w_ih"] + params["b_ih"]).astype(jnp.float32)  # [T, 3H]
    b_hh = params["b_hh"][None, :].astype(jnp.float32)
    w_hh = params["w_hh"].astype(jnp.float32)
    h = (h0 if h0 is not None else jnp.zeros((1, H), jnp.float32))
    if h.ndim == 1:
        h = h[None]

    outs = []
    for lo in range(0, T, CHUNK_T):
        chunk = x_proj[lo : lo + CHUNK_T]
        ys, h = _gru_chunk_call(chunk, w_hh, b_hh, h, interpret=interpret)
        outs.append(ys)
    ys = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    # final state keeps the [B, H] rank of nn_core.gru_layer (the function
    # this is a drop-in for) so cross-backend state carrying round-trips
    return ys[None], h


def apc_encode_pallas(params: Dict, mels: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """APC GRU stack via the VMEM recurrence kernel ([T, mel] -> [T, H])."""
    x = mels[None]
    for layer in params["layers"]:
        ys, _ = gru_layer_pallas(layer, x, interpret=interpret)
        x = ys
    return x[0]


def supports_pallas() -> bool:
    """Opt-in (LSP_PALLAS_RNN=1): the kernels beat the XLA scan ~2x in
    isolation on the TPU, but each pallas call is a separate dispatch and
    this harness's tunnelled backend charges enough per-dispatch latency
    that the in-pipeline stage times get worse; on a locally attached TPU
    (microsecond dispatch) the kernel path is the right default."""
    import os

    if os.environ.get("LSP_PALLAS_RNN") != "1":
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# LSTM twin (torch gate order i, f, g, o - matching nn_core.lstm_layer)
# ---------------------------------------------------------------------------


def _lstm_kernel(xp_ref, whh_ref, bhh_ref, h0_ref, c0_ref, ys_ref, hT_ref, cT_ref):
    """xp: [C, 4H]; whh: [H, 4H]; h0/c0: [1, H] -> ys: [C, H]."""
    C = xp_ref.shape[0]
    H = h0_ref.shape[1]

    def step(t, carry):
        h, c = carry
        gates = (xp_ref[t, :][None, :]
                 + jnp.dot(h, whh_ref[:, :], preferred_element_type=jnp.float32)
                 + bhh_ref[0, :][None, :])
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        ys_ref[t, :] = h_new[0, :]
        return (h_new, c_new)

    h, c = jax.lax.fori_loop(0, C, step, (h0_ref[:, :], c0_ref[:, :]))
    hT_ref[0, :] = h[0, :]
    cT_ref[0, :] = c[0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lstm_chunk_call(x_proj, w_hh, b_hh, h0, c0, interpret: bool = False):
    C = x_proj.shape[0]
    H = w_hh.shape[0]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _lstm_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
        in_specs=[spec] * 5,
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(x_proj, w_hh, b_hh, h0, c0)


def lstm_layer_pallas(params, x, state=None, interpret: bool = False):
    """Drop-in for nn_core.lstm_layer on a single sequence ([1, T, I])."""
    assert x.shape[0] == 1, "pallas LSTM path is for the batch-1 inference shape"
    T = x.shape[1]
    H = params["w_hh"].shape[0]
    x_proj = (x[0] @ params["w_ih"] + params["b_ih"]).astype(jnp.float32)
    b_hh = params["b_hh"][None, :].astype(jnp.float32)
    w_hh = params["w_hh"].astype(jnp.float32)
    if state is None:
        h = jnp.zeros((1, H), jnp.float32)
        c = jnp.zeros((1, H), jnp.float32)
    else:
        h, c = state
        h = h[None] if h.ndim == 1 else h
        c = c[None] if c.ndim == 1 else c

    outs = []
    for lo in range(0, T, CHUNK_T):
        ys, h, c = _lstm_chunk_call(x_proj[lo : lo + CHUNK_T], w_hh, b_hh, h, c,
                                    interpret=interpret)
        outs.append(ys)
    ys = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return ys[None], (h, c)
