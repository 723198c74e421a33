"""Live streaming mode: push audio chunks in, get video frames out.

The reference is named *Live* Speech Portraits but ships only an offline
batch pipeline (demo.py processes a whole wav).  This module makes the
system genuinely streaming: `StreamingAnimator.push_audio()` accepts
arbitrary audio chunks and emits frames as soon as they are determined,
with outputs **identical to the offline pipeline** (same samples from the
same PRNG schedule, same smoothing) up to one documented divergence*.

Why this drops out of the TPU-first design: every sequential stage already
carries explicit state -
    APC        - GRU hidden per layer
    Audio2Mouth- LSTM (h, c) per layer (+ `frame_future` lookahead)
    Headpose   - WaveNet dilation ring buffers + previous sample, per-step
                 PRNG keys fold_in(key, i) so sampling is position-stable
    smoothing  - a delay line of `radius = int(4 sigma + 0.5)` frames
so streaming is just re-chunking the offline scans.  Algorithmic latency is
    max(frame_future_mouth + mouth_radius, frame_future_head + head_radius)
frames (~55 frames = 0.92 s at the May settings - dominated by the
reference's own non-causal smoothing sigmas and future-shifted training).

*divergence: offline lip de-intersection shifts outer lips by the mean
overlap across ALL flipped frames of the clip (funcs/utils.py:352), which
is non-causal; streaming uses each frame's own mean overlap.
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from livespeechportraits_tpu.config import (
    EYE_BROW_INDICES,
    FPS,
    MOUTH_INDICES,
    PersonConfig,
    SAMPLE_RATE,
)
from livespeechportraits_tpu.models import nn_core, wavenet
from livespeechportraits_tpu.ops import gmm, manifold, rasterize, rasterize_pallas
from livespeechportraits_tpu.ops.mel import (
    LOG_MEL_MIN,
    _hann_periodic,
    _reflect_index,
    mel_filterbank,
)
from livespeechportraits_tpu.ops.smoothing import _gaussian_kernel
from livespeechportraits_tpu.pipeline.animate import (
    _jit_render,
    _jit_render_jpeg,
    _jit_render_jpeg4,
    _jit_render_pack4e,
    _jit_render_yuv420,
    yuv420_to_rgb,
    yuv420_unpack,
)
from livespeechportraits_tpu.pipeline.assets import PersonAssets, PersonModels

MEL_STEP = SAMPLE_RATE * 0.5 / FPS  # 133.33 samples per 120 Hz frame
MEL_WIN = SAMPLE_RATE // FPS  # 266


def _mel_sample_end(i: int) -> int:
    """Last raw sample index (exclusive) needed by mel frame i."""
    return int(np.floor(i * MEL_STEP)) + MEL_WIN


@jax.jit
def _mel_chunk(audio_span: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Mel frames from a raw-sample span; offsets are frame starts relative
    to the span (precomputed on host).  [len(offsets), 80]."""
    col = _reflect_index(np.arange(512) - 189, MEL_WIN)
    idx = offsets[:, None] + jnp.asarray(col)[None, :]
    w = _hann_periodic(MEL_WIN)
    window = np.zeros(512, np.float32)
    window[123 : 123 + MEL_WIN] = w
    frames = audio_span[idx] * jnp.asarray(window)
    mag = jnp.abs(jnp.fft.rfft(frames, n=512, axis=-1))
    basis = jnp.asarray(mel_filterbank())
    melspec = jnp.einsum("tf,mf->tm", mag, basis, precision=jax.lax.Precision.HIGHEST)
    log_mel = jnp.log(jnp.clip(melspec, min=1e-5))
    return (log_mel - LOG_MEL_MIN) / -LOG_MEL_MIN


@functools.partial(jax.jit,
                   static_argnames=("use_lle", "knear", "percent", "residual"))
def _audio_feats_chunk(layers, audio_span, offsets, h_list, valid, lle_base,
                       use_lle, knear, percent, residual=False):
    """Fused per-chunk feature program: mel framing + APC GRU stack + LLE
    projection in ONE device dispatch (they were three; per-dispatch
    latency dominates small chunk programs on a tunnelled backend)."""
    mels = _mel_chunk(audio_span, offsets)
    feats, new_h = _gru_chunk_masked(layers, mels, h_list, valid,
                                     residual=residual)
    if use_lle:
        feats = manifold.lle_project(feats, lle_base, K=knear, percent=percent)
    return feats, new_h


class _RowBuffer:
    """Append-only row stream with a retired prefix (bounded memory for
    unbounded live sessions).  Absolute row indices stay valid after
    retirement; only rows >= base are resident."""

    def __init__(self, shape: Tuple[int, ...], dtype=np.float32):
        self.base = 0
        self.buf = np.zeros((0,) + tuple(shape), dtype)

    def __len__(self) -> int:  # total rows ever appended
        return self.base + self.buf.shape[0]

    @property
    def resident(self) -> int:
        return self.buf.shape[0]

    def append(self, rows: np.ndarray) -> None:
        rows = np.asarray(rows)
        if rows.shape[0]:
            self.buf = np.concatenate([self.buf, rows])

    def slice(self, a: int, b: int) -> np.ndarray:
        assert a >= self.base, f"rows [{a}, {b}) retired (base={self.base})"
        return self.buf[a - self.base : b - self.base]

    def retire(self, upto: int) -> None:
        """Drop rows < upto (clamped to what exists)."""
        k = max(0, min(upto, len(self)) - self.base)
        if k:
            self.buf = self.buf[k:]
            self.base += k


@functools.partial(jax.jit, static_argnames=("residual",))
def _gru_chunk_masked(layers, mels, h_list, valid, residual=False):
    """APC GRU stack over a (padded) chunk with masked carry updates.

    mels: [C, 80]; valid: [C] bool.  Returns ([C, H], new h_list).
    residual adds the layer input between hidden-sized layers, exactly
    apc.apply_apc's gating (never after the top layer).
    """
    x = mels[None]  # [1, C, 80]
    n = len(layers)
    new_h = []
    for li, (layer, h0) in enumerate(zip(layers, h_list)):
        x_proj = x[0] @ layer["w_ih"] + layer["b_ih"]  # [C, 3H]

        def step(h, xs):
            xp, ok = xs
            hp = h @ layer["w_hh"] + layer["b_hh"]
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = jnp.where(ok, (1 - z) * n + z * h, h)
            return h_new, h_new

        hT, ys = jax.lax.scan(step, h0, (x_proj, valid))
        new_h.append(hT)
        if li + 1 < n and residual and x.shape[-1] == ys.shape[-1]:
            ys = ys + x[0]
        x = ys[None]
    return x[0], new_h


@jax.jit
def _lstm_chunk_masked(params, pairs, state, valid):
    """Audio2Feature downsample+LSTM+fc over a (padded) chunk of paired
    features.  pairs: [C, 2H]; state: list of (h, c); valid: [C]."""
    y = nn_core.dense(params["down1"], pairs)
    y, _ = nn_core.batchnorm(params["down_bn"], y, training=False)
    y = nn_core.leaky_relu(y)
    y = nn_core.dense(params["down2"], y)  # [C, H]

    new_state = []
    x = y
    for layer, (h0, c0) in zip(params["lstm"], state):
        x_proj = x @ layer["w_ih"] + layer["b_ih"]

        def step(carry, xs):
            (h, c), (xp, ok) = carry, xs
            gates = xp + h @ layer["w_hh"] + layer["b_hh"]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = jnp.where(ok, f * c + i * g, c)
            h_new = jnp.where(ok, o * jnp.tanh(c_new), h)
            return (h_new, c_new), h_new

        (hT, cT), ys = jax.lax.scan(step, (h0, c0), (x_proj, valid))
        new_state.append((hT, cT))
        x = ys
    z = nn_core.dense(params["fc1"], x)
    z, _ = nn_core.batchnorm(params["fc1_bn"], z, training=False)
    z = nn_core.leaky_relu(z)
    z = nn_core.dense(params["fc2"], z)
    z, _ = nn_core.batchnorm(params["fc2_bn"], z, training=False)
    z = nn_core.leaky_relu(z)
    return nn_core.dense(params["fc3"], z), new_state


@functools.partial(jax.jit, static_argnames=("cfg", "sigma_scale"))
def _decode_chunk_masked(params, cfg, state, prev, f_adds, g_adds, keys, valid,
                         sigma_scale):
    """A2H streaming decode over a (padded) chunk.

    f_adds/g_adds: [C, L, dil]; keys: [C] PRNG keys; valid: [C].
    Returns (state, prev, samples [C, ndim]).
    """
    wparams = params["wavenet"]

    def step(carry, xs):
        state, prev = carry
        fa, ga, k, ok = xs
        proj = [(fa[li][None], ga[li][None]) for li in range(fa.shape[0])]
        new_state, out = wavenet.stream_step(wparams, cfg.wavenet, state,
                                             prev[None], cond_proj_t=proj)
        sample = gmm.sample_gmm(k, out, cfg.ncenter, cfg.ndim,
                                sigma_scale=sigma_scale)[0]
        state = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_state, state)
        new_prev = jnp.where(ok, sample, prev)
        return (state, new_prev), sample

    (state, prev), samples = jax.lax.scan(step, (state, prev),
                                          (f_adds, g_adds, keys, valid))
    return state, prev, samples


@functools.partial(jax.jit, static_argnames=("cfg", "sigma_scale"))
def _decode_chunk_cond(params, cfg, state, prev, cond_rows, keys, valid,
                       sigma_scale):
    """A2H streaming decode with the per-layer conditioning projections
    computed INSIDE the program (one dispatch instead of projection +
    decode).  cond_rows: [C, cond_channels]."""
    proj = wavenet.precompute_cond_projections(params["wavenet"], cond_rows[None])
    f_adds = jnp.stack([p[0][0] for p in proj], axis=1)  # [C, L, dil]
    g_adds = jnp.stack([p[1][0] for p in proj], axis=1)
    return _decode_chunk_masked(params, cfg, state, prev, f_adds, g_adds,
                                keys, valid, sigma_scale)


@functools.partial(jax.jit, static_argnames=("a2h_cfg", "sigma_scale"))
def _motion_chunk_fused(a2f_params, a2h_params, a2h_cfg, pairs, lstm_state,
                        wn_state, prev, keys, old_tail, win_off, sigma_scale):
    """Steady-state fused motion advance: the A2F LSTM chunk, the A2H
    audio downsample and the A2H WaveNet/GMM decode in ONE device
    program, outputs packed into ONE [C, a2f+cond+ndim] f32 buffer - a
    single dispatch and a single blocking fetch per chunk instead of
    three of each (each forced fetch costs a full relay round-trip on
    this harness; see CLAUDE.md).  Inlines the exact per-stage programs
    (_lstm_chunk_masked / _audio_downsample / _decode_chunk_cond), so the
    math is the same ops in the same order.

    The decode's conditioning window trails the downsample front by
    0 <= lag < C rows in steady state, so it straddles previously
    computed rows and this chunk's fresh ones: old_tail [C, D] carries
    the last C cached rows and the window is a dynamic_slice at win_off
    (= C - lag, traced, so a drifting lag never recompiles) of their
    concatenation with the fresh rows.  Eligibility (exactly one chunk of
    advance for every stage) is checked by the caller
    (StreamingAnimator._advance_motion_fused); everything else falls back
    to the per-stage path."""
    import livespeechportraits_tpu.models.audio2headpose as a2h_mod

    C = pairs.shape[0]
    valid = jnp.ones((C,), bool)
    a2f_out, lstm_state = _lstm_chunk_masked(a2f_params, pairs, lstm_state,
                                             valid)
    new_rows, _ = a2h_mod._audio_downsample(a2h_params, pairs[None], False)
    rows2c = jnp.concatenate([old_tail, new_rows[0]], axis=0)  # [2C, D]
    cond = jax.lax.dynamic_slice(
        rows2c, (win_off, jnp.int32(0)), (C, rows2c.shape[1]))
    wn_state, prev, samples = _decode_chunk_cond(
        a2h_params, a2h_cfg, wn_state, prev, cond, keys, valid, sigma_scale)
    packed = jnp.concatenate(
        [a2f_out.astype(jnp.float32), new_rows[0].astype(jnp.float32),
         samples.astype(jnp.float32)], axis=1)
    return packed, lstm_state, wn_state, prev


@functools.partial(jax.jit, static_argnames=("a2h_cfg", "use_lle", "knear",
                                              "percent", "residual",
                                              "sigma_scale"))
def _stream_chunk_fused(apc_layers, a2f_params, a2h_params, a2h_cfg,
                        audio_span, offsets, apc_h, lle_base, lstm_state,
                        wn_state, prev, keys, old_tail, win_off,
                        use_lle, knear, percent, residual, sigma_scale):
    """Steady-state fused WHOLE-MOTION-HALF advance: mel framing + APC GRU
    + LLE + A2F LSTM + A2H downsample + A2H WaveNet/GMM decode in ONE
    device program with ONE flat f32 output buffer.

    vs the two-program steady state (_audio_feats_chunk then
    _motion_chunk_fused) this removes, per chunk: one dispatch (~30 ms
    relay RTT), one blocking feature fetch (another RTT), and the
    device->host->device round trip of the feature rows (the per-stage
    path fetches feats only to re-upload them as `pairs`).  The feature
    rows still come back to the host - inside the same packed fetch - so
    the host-side buffers, retirement logic and flush tail stay byte
    identical with the per-stage path.

    Inlines the exact per-stage jitted programs, so the math is the same
    ops in the same order (the convention every fused path here follows);
    bitwise equality vs the per-stage stream is asserted in
    tests/test_streaming.py."""
    C2 = offsets.shape[0]  # 2*chunk mel rows
    feats, new_apc_h = _audio_feats_chunk(
        apc_layers, audio_span, offsets, apc_h,
        jnp.ones((C2,), bool), lle_base, use_lle, knear, percent,
        residual=residual)
    pairs = feats.reshape(C2 // 2, -1)
    packed, lstm_state, wn_state, prev = _motion_chunk_fused(
        a2f_params, a2h_params, a2h_cfg, pairs, lstm_state, wn_state,
        prev, keys, old_tail, win_off, sigma_scale)
    flat = jnp.concatenate([packed.ravel(),
                            feats.astype(jnp.float32).ravel()])
    return flat, new_apc_h, lstm_state, wn_state, prev


class _StreamSmoother:
    """Exact streaming equivalent of scipy/our gaussian_filter1d: emits
    output t once inputs through t+radius exist; the left boundary uses the
    same reflect padding as the offline call; flush() reflects the right
    boundary."""

    def __init__(self, sigma: float, max_radius: Optional[int] = None):
        self.kernel = _gaussian_kernel(sigma) if sigma > 0 else None
        self.radius = (len(self.kernel) // 2) if self.kernel is not None else 0
        if max_radius is not None and self.kernel is not None and self.radius > max_radius:
            # Truncate the look-AHEAD side only: the causal (past) half keeps
            # its full extent, the future half is cut at max_radius and the
            # kernel renormalised.  Latency drops to max_radius frames at the
            # cost of slightly less smoothing right of centre.
            k = self.kernel[: self.radius + max_radius + 1]
            self.kernel = (k / k.sum()).astype(np.float32)
            self.future = max_radius
        else:
            self.future = self.radius
        self.buf: List[np.ndarray] = []  # resident rows [base, total)
        self.base = 0  # retired prefix length
        self.emitted = 0

    @property
    def total(self) -> int:
        """Rows ever pushed (absolute)."""
        return self.base + len(self.buf)

    def _row(self, src: int) -> np.ndarray:
        return self.buf[src - self.base]

    def _window(self, t: int) -> np.ndarray:
        if self.kernel is None:
            return self._row(t)
        n = self.total
        out = 0.0
        for j, kj in enumerate(self.kernel):
            # closed-form repeated reflection (period-2n triangle), exactly
            # ops/smoothing.gaussian_filter1d's index map - a single
            # reflection is not enough when the kernel radius exceeds the
            # resident row count (short clips / early latency-capped rows)
            src = (t + j - self.radius) % (2 * n)
            if src >= n:
                src = 2 * n - src - 1
            out = out + kj * self._row(src)
        return out.astype(np.float32)

    def _retire(self) -> None:
        # Future windows read rows >= emitted - radius (flush's right
        # reflection also lands there); drop everything older.
        keep_from = max(self.emitted - self.radius, 0)
        k = keep_from - self.base
        if k > 0:
            del self.buf[:k]
            self.base = keep_from

    def push(self, rows: np.ndarray) -> np.ndarray:
        """rows: [n, ...] new raw values; returns newly determined smoothed
        rows (possibly empty)."""
        self.buf.extend(np.asarray(r) for r in rows)
        ready_until = self.total - self.future  # exclusive
        out = [self._window(t) for t in range(self.emitted, max(self.emitted, ready_until))]
        self.emitted = max(self.emitted, ready_until)
        self._retire()
        return np.stack(out) if out else np.zeros((0,) + np.shape(self.buf[0]), np.float32)

    def flush(self) -> np.ndarray:
        out = [self._window(t) for t in range(self.emitted, self.total)]
        self.emitted = self.total
        self._retire()
        return np.stack(out) if out else np.zeros((0,) + (np.shape(self.buf[0]) if self.buf else ()), np.float32)


class StreamingAnimator:
    """Incremental audio -> frames with offline-identical outputs."""

    def __init__(self, cfg: PersonConfig, assets: PersonAssets,
                 models: PersonModels, seed: int = 0, chunk: int = 32,
                 render_batch: int = 4,
                 smooth_latency_cap: Optional[int] = None,
                 pipeline_depth: int = 0,
                 transfer: str = "rgb"):
        """smooth_latency_cap (frames) truncates the smoothers' look-ahead
        for lower live latency (the offline pipeline's head-pose smoothing
        alone looks 40 frames = 0.67 s into the future); None keeps
        offline-exact output.

        pipeline_depth > 0 double-buffers the renderer: push_audio()
        dispatches this push's render but returns frames from up to
        `pipeline_depth` pushes ago, so the host fetch of chunk k overlaps
        the device compute of chunk k+1's motion and render (the device
        queue is in-order; only the host<->device transfer is moved off
        the critical path).  Frames are identical, just handed back one
        push later; flush() always drains.

        transfer='yuv420' ships each frame across the host link as planar
        4:2:0 (half the bytes of uint8 RGB; chroma subsampled exactly as
        any video encoder would) and reassembles RGB on the host - same
        option and math as the offline pipeline's animate(transfer=...)."""
        self.cfg = cfg
        self.assets = assets
        self.models = models
        self.chunk = chunk  # video frames per device dispatch
        self.render_batch = render_batch
        self.key = jax.random.PRNGKey(seed)

        a2h = cfg.audio2headpose
        self.R = a2h.wavenet.receptive_field
        self.ff_m = cfg.audio2feature.frame_future
        self.ff_h = a2h.frame_future

        # carried model state
        H = cfg.apc.hidden_size
        self._apc_h = [jnp.zeros((H,)) for _ in models.apc["layers"]]
        lh = cfg.audio2feature.lstm_hidden_size
        self._lstm = [(jnp.zeros((lh,)), jnp.zeros((lh,))) for _ in models.audio2feature["lstm"]]
        self._wn_state = None
        self._prev_sample = jnp.zeros((a2h.wavenet.input_channels,))

        # host-side stream buffers.  All are retire-as-consumed so memory
        # stays bounded over unbounded live sessions (a soak test asserts
        # this): _RowBuffer keeps absolute indices valid after retirement.
        self._audio = np.zeros(0, np.float32)  # resident samples [audio_base, total)
        self._audio_base = 0
        self._total_samples = 0
        self._mel_done = 0  # mel frames computed
        self._feats = _RowBuffer((cfg.apc.hidden_size,))  # 120 Hz projected APC features
        self._a2f_raw = _RowBuffer((cfg.audio2feature.output_dim,))  # raw A2F outputs (pre shift)
        self._head_raw = _RowBuffer((a2h.ndim,))  # raw A2H samples
        self._down_rows = _RowBuffer((a2h.wavenet.cond_channels,))  # A2H audio-downsample cache
        self._decoded = 0

        cap = smooth_latency_cap
        self._mouth_smooth = _StreamSmoother(cfg.audio2feature.smooth_sigma, cap)
        self._rot_smooth = _StreamSmoother(a2h.smooth_sigmas[0], cap)
        self._trans_smooth = _StreamSmoother(a2h.smooth_sigmas[1], cap)
        self._mouth_ready = _RowBuffer((73, 3))
        self._rot_ready = _RowBuffer((3,))
        self._trans_ready = _RowBuffer((3,))
        self._emitted_frames = 0
        self._flushed = False
        self.pipeline_depth = pipeline_depth
        self.transfer = transfer
        # pack4e prefix-fetch state: the last decoded batch's true coded
        # bytes drive the next fetch's bucket (GIL-atomic dict writes;
        # heuristic only - a stale read just over- or under-fetches once)
        self._p4e_state: dict = {}
        # Two single-thread stages per live stream: the fetch thread
        # blocks on device->host transfers (IO wait), the decode thread
        # runs the fused CPU-XLA decode of compressed transfers; chunk
        # k's fetch+decode overlap chunk k+1's device compute AND each
        # other, so the push thread only dispatches and collects
        # finished futures (same split as animate.render_frames).
        from concurrent.futures import ThreadPoolExecutor

        self._ex_fetch = ThreadPoolExecutor(1)
        self._ex_dec = ThreadPoolExecutor(1)
        self._render_inflight: List[Any] = []
        # per-push stage wall-clock (cumulative ms per stage name), for
        # the dispatch-budget attribution tools/stream_budget.py prints -
        # a plain dict fill, negligible when nobody reads it
        self.stage_ms: dict = {}

    # -- latency ----------------------------------------------------------

    @property
    def latency_frames(self) -> int:
        return max(self.ff_m + self._mouth_smooth.future,
                   self.ff_h + max(self._rot_smooth.future, self._trans_smooth.future))

    # -- stage advancement --------------------------------------------------

    def _advance_mel_apc(self, flush: bool) -> None:
        total_mel = (2 * int(self._total_samples / SAMPLE_RATE * FPS)
                     if flush else None)
        while True:
            a = self._mel_done
            b = a + 2 * self.chunk
            if flush and total_mel is not None:
                b = min(b, total_mel)
                if b <= a:
                    return
            else:
                if _mel_sample_end(b - 1) > self._total_samples:
                    return
            n = b - a
            start = int(np.floor(a * MEL_STEP))
            end = _mel_sample_end(b - 1)
            span = self._audio[start - self._audio_base : end - self._audio_base]
            if end > self._total_samples:
                span = np.concatenate([span, np.zeros(end - self._total_samples, np.float32)])
            offsets = np.asarray(
                [int(np.floor(i * MEL_STEP)) - start for i in range(a, b)], np.int32
            )
            # pad the chunk to the fixed size for a single compiled shape;
            # mel + APC GRU + LLE run as ONE fused dispatch
            C = 2 * self.chunk
            pad = C - n
            offsets_p = np.concatenate([offsets, np.zeros(pad, np.int32)])
            valid = np.arange(C) < n
            feats, self._apc_h = _audio_feats_chunk(
                self.models.apc["layers"], jnp.asarray(span),
                jnp.asarray(offsets_p), self._apc_h, jnp.asarray(valid),
                self.assets.device("apc_feature_base"),
                bool(self.cfg.apc.use_LLE), int(self.cfg.apc.Knear),
                float(self.cfg.apc.LLE_percent),
                residual=bool(self.cfg.apc.residual))
            self._feats.append(np.asarray(feats[:n]))
            self._mel_done = b
            # retire consumed audio: nothing before the next mel frame's
            # first sample is ever read again
            keep_from = int(np.floor(b * MEL_STEP))
            k = keep_from - self._audio_base
            if k > 0:
                self._audio = self._audio[k:]
                self._audio_base = keep_from
            if flush and total_mel is not None and b >= total_mel:
                return

    def _advance_a2f(self, flush: bool) -> None:
        """Consume paired feature rows into raw A2F outputs; at flush the
        tail repeats the final feature (offline parity)."""
        done = len(self._a2f_raw)
        total_rows = len(self._feats)
        avail = total_rows // 2 + (self.ff_m if flush and total_rows else 0)
        while avail - done >= (1 if flush else self.chunk):
            n = min(self.chunk, avail - done)
            lo, hi = 2 * done, 2 * (done + n)
            even_rows = (total_rows // 2) * 2
            real_lo, real_hi = min(lo, even_rows), min(hi, even_rows)
            pairs = self._feats.slice(real_lo, real_hi)
            tile_rows = (hi - lo) - (real_hi - real_lo)
            if tile_rows:  # flush tail: repeat the last (even-trimmed)
                # feature row, matching offline generate_sequence
                last = self._feats.slice(even_rows - 1, even_rows)
                pairs = np.concatenate([pairs, np.tile(last, (tile_rows, 1))])
            pairs = pairs.reshape(n, -1)
            C = self.chunk
            pairs_p = np.concatenate([pairs, np.zeros((C - n, pairs.shape[1]), np.float32)])
            valid = np.arange(C) < n
            out, self._lstm = _lstm_chunk_masked(
                self.models.audio2feature, jnp.asarray(pairs_p), self._lstm,
                jnp.asarray(valid))
            self._a2f_raw.append(np.asarray(out[:n]))
            done += n
            self._retire_feats()
            if flush and done >= avail:
                break

    def _retire_feats(self) -> None:
        """Feature rows are read by A2F (from 2*len(_a2f_raw)) and by the
        A2H downsample cache (from 2*len(_down_rows)); the flush tail also
        re-reads the final row, so always keep the last pair."""
        upto = min(2 * len(self._a2f_raw), 2 * len(self._down_rows),
                   max(len(self._feats) - 2, 0))
        self._feats.retire(upto)

    def _advance_motion_fused(self) -> bool:
        """One-program steady-state advance of A2F + A2H downsample + A2H
        decode (see _motion_chunk_fused).  Engages only when every stage
        advances by exactly one chunk (the steady state of chunk-sized
        pushes) and the decode's conditioning window fits in the last C
        cached rows + the fresh chunk; returns False otherwise so
        push_audio runs the per-stage path (startup, flush, ragged
        pushes, catch-up bursts).  The WaveNet ring state must already be
        primed (the first pushes always go per-stage)."""
        C = self.chunk
        T = len(self._feats) // 2
        done = len(self._a2f_raw)
        lo = len(self._down_rows)
        total = T - self.ff_h
        lag = (total - self._decoded) - C  # decode's trail behind the front
        if (self._wn_state is None or T - done != C or T - lo != C
                or lag < 0 or lag >= C or lo < C):
            return False
        pairs = self._feats.slice(2 * done, 2 * T).reshape(C, -1)
        keys = jax.vmap(lambda i: jax.random.fold_in(self.key, i))(
            jnp.arange(self._decoded, self._decoded + C))
        # the un-retired cached rows are exactly [decoded + ff_h, lo) - the
        # `lag` rows the decode window still needs; pad to the fixed [C, D]
        # shape at the front (the padding sits below the window offset and
        # is never read by the dynamic_slice)
        kept = self._down_rows.slice(self._decoded + self.ff_h, lo)
        old_tail = np.concatenate(
            [np.zeros((C - lag,) + kept.shape[1:], np.float32), kept])
        state1 = jax.tree.map(lambda b: b[None], self._wn_state)
        packed, self._lstm, state1, self._prev_sample = _motion_chunk_fused(
            self.models.audio2feature, self.models.audio2headpose,
            self.cfg.audio2headpose, jnp.asarray(pairs), self._lstm,
            state1, self._prev_sample, keys, jnp.asarray(old_tail),
            jnp.int32(C - lag),
            float(self.cfg.audio2headpose.sample_sigma_scale))
        self._wn_state = jax.tree.map(lambda b: b[0], state1)
        arr = np.asarray(packed)  # the ONE blocking fetch for this chunk
        d_out = self.cfg.audio2feature.output_dim
        d_cond = self.cfg.audio2headpose.wavenet.cond_channels
        self._a2f_raw.append(arr[:, :d_out])
        self._down_rows.append(arr[:, d_out:d_out + d_cond])
        self._head_raw.append(arr[:, d_out + d_cond:])
        self._decoded += C
        self._down_rows.retire(self._decoded + self.ff_h)
        self._retire_feats()
        self.stage_ms["fused_chunks"] = self.stage_ms.get("fused_chunks",
                                                          0.0) + 1
        return True

    def _advance_stream_fused(self) -> bool:
        """One-program steady-state advance of the ENTIRE motion half -
        mel + APC + LLE + A2F + A2H downsample + A2H decode (see
        _stream_chunk_fused).  Engages when the pending audio admits
        exactly one 2*chunk mel block AND every downstream stage would
        then advance by exactly one chunk; returns False otherwise
        (startup, flush, ragged pushes and catch-up bursts go per-stage,
        which stays bit-identical)."""
        C = self.chunk
        a = self._mel_done
        b = a + 2 * C
        if (_mel_sample_end(b - 1) > self._total_samples
                # 2+ blocks pending: catch up per-stage
                or _mel_sample_end(b + 2 * C - 1) <= self._total_samples
                or len(self._feats) % 2):
            return False
        T = len(self._feats) // 2
        done = len(self._a2f_raw)
        lo = len(self._down_rows)
        lag = T - self.ff_h - self._decoded  # post-advance decode trail
        if (self._wn_state is None or done != T or lo != T
                or lag < 0 or lag >= C or lo < C):
            return False

        start = int(np.floor(a * MEL_STEP))
        end = _mel_sample_end(b - 1)
        span = self._audio[start - self._audio_base : end - self._audio_base]
        # fixed span length -> one compiled shape (the true span length
        # wobbles +-1 sample with the fractional MEL_STEP; the pad tail
        # sits past every frame's last sample and is never gathered)
        span_fixed = int(np.ceil(2 * C * MEL_STEP)) + MEL_WIN
        span = np.concatenate(
            [span, np.zeros(span_fixed - len(span), np.float32)])
        offsets = np.asarray([int(np.floor(i * MEL_STEP)) - start
                              for i in range(a, b)], np.int32)
        keys = jax.vmap(lambda i: jax.random.fold_in(self.key, i))(
            jnp.arange(self._decoded, self._decoded + C))
        kept = self._down_rows.slice(self._decoded + self.ff_h, lo)
        old_tail = np.concatenate(
            [np.zeros((C - lag,) + kept.shape[1:], np.float32), kept])
        state1 = jax.tree.map(lambda s: s[None], self._wn_state)
        flat, self._apc_h, self._lstm, state1, self._prev_sample = \
            _stream_chunk_fused(
                self.models.apc["layers"], self.models.audio2feature,
                self.models.audio2headpose, self.cfg.audio2headpose,
                jnp.asarray(span), jnp.asarray(offsets), self._apc_h,
                self.assets.device("apc_feature_base"), self._lstm,
                state1, self._prev_sample, keys, jnp.asarray(old_tail),
                jnp.int32(C - lag), bool(self.cfg.apc.use_LLE),
                int(self.cfg.apc.Knear), float(self.cfg.apc.LLE_percent),
                bool(self.cfg.apc.residual),
                float(self.cfg.audio2headpose.sample_sigma_scale))
        self._wn_state = jax.tree.map(lambda s: s[0], state1)
        arr = np.asarray(flat)  # the ONE blocking fetch for this chunk
        D = self._feats.buf.shape[1]
        n_feats = 2 * C * D
        packed = arr[: len(arr) - n_feats].reshape(C, -1)
        feats = arr[len(arr) - n_feats :].reshape(2 * C, D)
        # mel bookkeeping (exactly _advance_mel_apc's loop tail)
        self._feats.append(feats)
        self._mel_done = b
        keep_from = int(np.floor(b * MEL_STEP))
        k = keep_from - self._audio_base
        if k > 0:
            self._audio = self._audio[k:]
            self._audio_base = keep_from
        # motion bookkeeping (exactly _advance_motion_fused's tail)
        d_out = self.cfg.audio2feature.output_dim
        d_cond = self.cfg.audio2headpose.wavenet.cond_channels
        self._a2f_raw.append(packed[:, :d_out])
        self._down_rows.append(packed[:, d_out : d_out + d_cond])
        self._head_raw.append(packed[:, d_out + d_cond :])
        self._decoded += C
        self._down_rows.retire(self._decoded + self.ff_h)
        self._retire_feats()
        self.stage_ms["mega_chunks"] = self.stage_ms.get("mega_chunks",
                                                         0.0) + 1
        return True

    def _advance_a2h(self, flush: bool) -> None:
        T = len(self._feats) // 2
        if T == 0:
            return
        a2h = self.cfg.audio2headpose
        total = max(T - self.ff_h, 0)
        # The audio_downsample MLP is per-row stateless: extend the cached
        # downsampled rows incrementally (no O(T^2) recompute).
        import livespeechportraits_tpu.models.audio2headpose as a2h_mod

        if T > len(self._down_rows):
            lo = len(self._down_rows)
            paired = self._feats.slice(2 * lo, 2 * T).reshape(T - lo, -1)
            new_rows, _ = a2h_mod._audio_downsample(
                self.models.audio2headpose, jnp.asarray(paired[None]), False)
            self._down_rows.append(np.asarray(new_rows[0]))
            self._retire_feats()

        while total - self._decoded >= (1 if flush else self.chunk):
            n = min(self.chunk, total - self._decoded)
            i0 = self._decoded
            if self._wn_state is None:
                # prime ring buffers (audio rows clamped at 0)
                warm_idx = np.maximum(np.arange(-(self.R - 1), 0) + self.ff_h, 0)
                cond_warm = jnp.asarray(
                    self._down_rows.buf[warm_idx - self._down_rows.base])[None]
                x_warm = jnp.broadcast_to(
                    self._prev_sample, (1, self.R - 1, self._prev_sample.shape[-1]))
                self._wn_state = wavenet.stream_init(
                    self.models.audio2headpose["wavenet"], a2h.wavenet, x_warm, cond_warm)
                self._wn_state = jax.tree.map(lambda b: b[0], self._wn_state)

            # conditioning rows for this chunk (padded to the fixed shape);
            # projections happen inside the fused decode program
            C = self.chunk
            cond = self._down_rows.slice(i0 + self.ff_h, i0 + n + self.ff_h)
            cond_p = np.concatenate(
                [cond, np.zeros((C - n, cond.shape[1]), np.float32)])
            keys = jax.vmap(lambda i: jax.random.fold_in(self.key, i))(
                jnp.arange(i0, i0 + C))  # one dispatch, not C (relay latency)
            valid = jnp.asarray(np.arange(C) < n)

            state1 = jax.tree.map(lambda b: b[None], self._wn_state)
            state1, prev, samples = _decode_chunk_cond(
                self.models.audio2headpose, a2h, state1, self._prev_sample,
                jnp.asarray(cond_p), keys, valid, float(a2h.sample_sigma_scale))
            self._wn_state = jax.tree.map(lambda b: b[0], state1)
            self._prev_sample = prev
            self._head_raw.append(np.asarray(samples[:n]))
            self._decoded += n
            self._down_rows.retire(self._decoded + self.ff_h)

    def _advance_post(self) -> Tuple[np.ndarray, np.ndarray]:
        """Feed new raw predictions into the smoothers; return newly
        determined (mouth_pts3d [n,73,3-pre-mean], head [n,6])."""
        a2h = self.cfg.audio2headpose
        # mouth: raw output index t+ff is the prediction for frame t
        lo = self._mouth_smooth.total
        hi = len(self._a2f_raw) - self.ff_m
        if hi > lo:
            delta = self._a2f_raw.slice(lo + self.ff_m, hi + self.ff_m).reshape(-1, 25, 3)
            full = np.zeros((hi - lo, 73, 3), np.float32)
            full[:, np.asarray(MOUTH_INDICES)] = delta
            mouth_sm = self._mouth_smooth.push(full)
            self._a2f_raw.retire(lo + self.ff_m)  # rows below were consumed
        else:
            mouth_sm = np.zeros((0, 73, 3), np.float32)

        lo = self._rot_smooth.total
        hi = len(self._head_raw)
        if hi > lo:
            h = self._head_raw.slice(lo, hi)[:, :6].copy()
            h[:, :3] *= a2h.rot_amp
            h[:, 3:] *= a2h.trans_amp
            rot_sm = self._rot_smooth.push(h[:, :3])
            trans_sm = self._trans_smooth.push(h[:, 3:])
            self._head_raw.retire(hi)
        else:
            rot_sm = np.zeros((0, 3), np.float32)
            trans_sm = np.zeros((0, 3), np.float32)
        return mouth_sm, rot_sm, trans_sm

    def _flush_post(self):
        mouth_sm = self._mouth_smooth.flush()
        rot = self._rot_smooth.flush()
        trans = self._trans_smooth.flush()
        if mouth_sm.ndim == 1:
            mouth_sm = np.zeros((0, 73, 3), np.float32)
        if rot.ndim == 1:
            rot = np.zeros((0, 3), np.float32)
        if trans.ndim == 1:
            trans = np.zeros((0, 3), np.float32)
        return mouth_sm, rot, trans

    def _finalize_frames(self, mouth_sm: np.ndarray, rot_sm: np.ndarray,
                         trans_sm: np.ndarray, drain: bool = False) -> np.ndarray:
        """Per-frame tail of stage 5 + stage 6 for ready frames.

        rot and trans smoothers have different radii, so they become ready
        at different rates; frames emit once all three streams cover them.
        With pipeline_depth > 0, rendered batches park in _render_inflight
        and are fetched `pipeline_depth` pushes later (drain=True fetches
        everything).
        """
        self._mouth_ready.append(mouth_sm)
        self._rot_ready.append(rot_sm)
        self._trans_ready.append(trans_sm)
        n = min(len(self._mouth_ready), len(self._rot_ready),
                len(self._trans_ready)) - self._emitted_frames
        if n <= 0:
            return self._drain_inflight(0 if drain else self.pipeline_depth)
        a2f = self.cfg.audio2feature
        a2h = self.cfg.audio2headpose
        s = self._emitted_frames
        mouth = self._mouth_ready.slice(s, s + n)
        head = np.concatenate(
            [self._rot_ready.slice(s, s + n), self._trans_ready.slice(s, s + n)],
            axis=1,
        )

        from livespeechportraits_tpu.ops import geometry, smoothing

        pts = jnp.asarray(mouth)
        pts = smoothing.mouth_amp(pts, True, a2f.amp_method, a2f.amp_params)
        pts = pts + jnp.asarray(self.assets.mean_pts3d)
        pts = _deintersect_per_frame(pts)

        hd = jnp.asarray(head)
        hd = hd.at[:, 3:].add(jnp.asarray(self.assets.mean_translation))
        hd = hd.at[:, 0].add(180.0)

        final = jnp.broadcast_to(jnp.asarray(self.assets.std_mean_pts3d), (n, 73, 3))
        final = final.at[:, 46:64].set(pts[:, 46:64])
        ncand = self.assets.candidate_eye_brow.shape[0]
        brow_idx = (np.arange(s, s + n)) % ncand
        brows = jnp.asarray(self.assets.candidate_eye_brow)[jnp.asarray(brow_idx)] + \
            jnp.asarray(self.assets.mean_pts3d[list(EYE_BROW_INDICES)])
        final = final.at[:, jnp.asarray(np.asarray(EYE_BROW_INDICES))].set(brows)

        K = jnp.asarray(self.assets.camera_intrinsic)
        lm2d = geometry.project_landmarks(K, jnp.eye(3), jnp.zeros(3),
                                          self.assets.scale, hd, final)
        sh2d, _ = geometry.project_shoulders(
            K, jnp.asarray(self.assets.shoulder3D), hd[:, 3:],
            jnp.asarray(self.assets.ref_trans), a2h.shoulder_amp)

        outs, k = _dispatch_render(self.cfg, self.assets, self.models,
                                   lm2d, sh2d, self.render_batch,
                                   self.transfer)
        H = W = self.cfg.feature2face.load_size
        fetched = self._ex_fetch.submit(
            _fetch_outs, outs, self.transfer, self.render_batch, H, W,
            self._p4e_state)
        self._render_inflight.append(self._ex_dec.submit(
            lambda f=fetched, k=k: _decode_fetched(
                f.result(), k, H, W, self.transfer, self.render_batch,
                self._p4e_state)))
        self._emitted_frames += n
        for buf in (self._mouth_ready, self._rot_ready, self._trans_ready):
            buf.retire(self._emitted_frames)
        return self._drain_inflight(0 if drain else self.pipeline_depth)

    def _drain_inflight(self, keep: int) -> np.ndarray:
        """Collect all but the newest `keep` dispatched render chunks
        (each already fetching+decoding on the worker threads)."""
        H = W = self.cfg.feature2face.load_size
        ready = []
        while len(self._render_inflight) > keep:
            ready.append(self._render_inflight.pop(0).result())
        if not ready:
            return np.zeros((0, H, W, 3), np.uint8)
        return np.concatenate(ready)

    # -- public API ---------------------------------------------------------

    def push_audio(self, samples: np.ndarray) -> np.ndarray:
        """Feed raw 16 kHz samples; returns any newly determined frames
        [n, H, W, 3] uint8 (possibly empty)."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        import time as _time

        self._audio = np.concatenate([self._audio, np.asarray(samples, np.float32)])
        self._total_samples += len(samples)

        def _timed(name, fn, *a, **kw):
            t0 = _time.perf_counter()
            out = fn(*a, **kw)
            self.stage_ms[name] = self.stage_ms.get(name, 0.0) + \
                (_time.perf_counter() - t0) * 1e3
            return out

        if not _timed("stream_fused", self._advance_stream_fused):
            _timed("mel_apc", self._advance_mel_apc, flush=False)
            if not _timed("motion_fused", self._advance_motion_fused):
                _timed("a2f", self._advance_a2f, flush=False)
                _timed("a2h", self._advance_a2h, flush=False)
        mouth_sm, rot_sm, trans_sm = _timed("post", self._advance_post)
        return _timed("finalize_render", self._finalize_frames,
                      mouth_sm, rot_sm, trans_sm)

    def flush(self) -> np.ndarray:
        """Signal end of stream; returns the remaining frames."""
        self._flushed = True
        self._advance_mel_apc(flush=True)
        self._advance_a2f(flush=True)
        self._advance_a2h(flush=True)
        m1, r1, t1 = self._advance_post()
        m2, r2, t2 = self._flush_post()
        mouth = np.concatenate([m1, m2]) if len(m2) else m1
        rot = np.concatenate([r1, r2]) if len(r2) else r1
        trans = np.concatenate([t1, t2]) if len(t2) else t1
        frames = self._finalize_frames(mouth, rot, trans, drain=True)
        self.close()
        return frames

    def close(self) -> None:
        """Release the per-stream worker threads.  flush() calls this;
        servers that abandon a stream mid-flight (client disconnect)
        must call it too or idle fetch/decode threads accumulate until
        GC.  Idempotent; a closed stream rejects further pushes via the
        existing _flushed guard."""
        self._flushed = True
        self._ex_fetch.shutdown(wait=False)
        self._ex_dec.shutdown(wait=False)

    def __enter__(self) -> "StreamingAnimator":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


@jax.jit
def _deintersect_per_frame(pts3d: jnp.ndarray) -> jnp.ndarray:
    """Causal lip de-intersection: per-frame mean overlap for the outer
    lips instead of the offline global mean (see module docstring)."""
    from livespeechportraits_tpu.ops import smoothing as S

    ui = jnp.asarray(S.UPPER_INNER_LIP)
    li = jnp.asarray(S.LOWER_INNER_LIP)
    uo = jnp.asarray(S.UPPER_OUTER_LIP)
    lo = jnp.asarray(S.LOWER_OUTER_LIP)
    upper_y = pts3d[:, ui, 1]
    lower_y = pts3d[:, li, 1]
    flip = ((lower_y > upper_y).sum(axis=1) == 3)[:, None]
    diff_half = (lower_y - upper_y) * 0.5
    frame_mean = diff_half.mean(axis=1, keepdims=True)
    pts3d = pts3d.at[:, ui, 1].add(jnp.where(flip, diff_half, 0.0))
    pts3d = pts3d.at[:, li, 1].add(jnp.where(flip, -diff_half, 0.0))
    pts3d = pts3d.at[:, uo, 1].add(jnp.where(flip, frame_mean, 0.0))
    pts3d = pts3d.at[:, lo, 1].add(jnp.where(flip, -frame_mean, 0.0))
    return pts3d


def _dispatch_render(cfg, assets, models, lm2d, sh2d, render_batch,
                     transfer: str = "rgb"):
    """Dispatch rasterise+render for a variable number of ready frames in
    fixed-size batches; returns (device batches, n) WITHOUT fetching -
    the device queue runs on while the host moves on."""
    n = lm2d.shape[0]
    H = W = cfg.feature2face.load_size
    if assets.image_pad is not None:
        top, bottom, left, right = assets.image_pad
        sh2d = sh2d + jnp.asarray([right - left, top - bottom], jnp.float32)
    # device-cached subject constants: 12 MB at 512^2, re-uploading per
    # chunk over the ~8 MB/s relay would dominate the live latency path
    cand = assets.device("candidate_images")
    cand_stack = jnp.concatenate(list(cand), axis=-1)
    compute_dtype = jnp.bfloat16 if cfg.feature2face.precision == "bfloat16" else None
    if rasterize_pallas.supports_pallas():
        rasterize_fn = rasterize_pallas.rasterize_feature_maps_pallas
    else:
        rasterize_fn = rasterize.rasterize_feature_maps

    pad_to = -(-n // render_batch) * render_batch if n else 0
    if pad_to == 0:
        return [], 0
    lm = jnp.concatenate([lm2d, jnp.broadcast_to(lm2d[-1:], (pad_to - n, 73, 2))])
    sh = jnp.concatenate([sh2d, jnp.broadcast_to(sh2d[-1:], (pad_to - n,) + sh2d.shape[1:])])
    outs = []
    for s in range(0, pad_to, render_batch):
        edge = rasterize_fn(lm[s : s + render_batch], sh[s : s + render_batch], (H, W))
        inp = jnp.concatenate(
            [edge[..., None], jnp.broadcast_to(cand_stack, (render_batch, H, W, 12))],
            axis=-1)
        fn = {"yuv420": _jit_render_yuv420,
              "jpeg": _jit_render_jpeg,
              "jpeg4": _jit_render_jpeg4,
              "pack4e": _jit_render_pack4e}.get(transfer, _jit_render)
        outs.append(fn(models.feature2face["net"],
                       models.feature2face["size"], inp, compute_dtype))
    return outs, n


def _fetch_outs(outs, transfer, render_batch, H, W, p4e_state):
    """Fetch-thread body: pull each dispatched batch to the host.

    For pack4e each entry is (flat stream, total); only a bucketed PREFIX
    of the stream crosses the link, sized from the last decoded batch's
    true coded bytes (the same policy as animate.render_frames) — the
    live-latency win is proportional: a chunk's frames cost ~entropy
    bytes, not the static pack4 size.  The very first fetch of a stream
    seeds from the process-level animate._P4E_NEED cache, so a new live
    session does not pay a full-cap first fetch when any earlier
    render at this shape already learned the subject's coded size."""
    if transfer != "pack4e":
        return [np.asarray(o) for o in outs]
    from livespeechportraits_tpu.pipeline import compress
    from livespeechportraits_tpu.pipeline.animate import _P4E_NEED

    cap_total = render_batch * compress.p4e_bytes_per_frame_cap(H, W)
    step = -(-cap_total // 32)
    res = []
    for flat, _total in outs:
        need = (p4e_state.get("need")
                or _P4E_NEED.get((H, W, render_batch))
                or cap_total)
        bucket = min(cap_total, -(-max(1, min(need, cap_total)) // step) * step)
        res.append((np.asarray(flat[:bucket]), flat))
    return res


def _decode_fetched(outs, n, H, W, transfer: str = "rgb",
                    render_batch: int = 0, p4e_state=None) -> np.ndarray:
    """Host-side decode of already-fetched per-batch arrays -> RGB."""
    if not outs:
        return np.zeros((0, H, W, 3), np.uint8)
    if transfer == "yuv420":
        from livespeechportraits_tpu.pipeline import compress

        return np.concatenate([
            compress.i420_to_rgb(o, H, W) for o in outs])[:n]
    if transfer == "jpeg":
        from livespeechportraits_tpu.pipeline import compress

        return np.concatenate([
            compress.decode_to_rgb(o, H, W) for o in outs])[:n]
    if transfer == "jpeg4":
        from livespeechportraits_tpu.pipeline import compress

        return np.concatenate([
            compress.decode_to_rgb_p4(o, H, W) for o in outs])[:n]
    if transfer == "pack4e":
        from livespeechportraits_tpu.pipeline import compress

        frames = []
        for prefix, flat in outs:
            try:
                rgb, consumed = compress.decode_to_rgb_p4e(
                    prefix, render_batch, H, W, return_consumed=True)
            except IndexError:
                rgb, consumed = compress.decode_to_rgb_p4e(
                    np.asarray(flat), render_batch, H, W,
                    return_consumed=True)
            if p4e_state is not None:
                p4e_state["need"] = int(consumed * 1.15)
                from livespeechportraits_tpu.pipeline.animate import (
                    _P4E_NEED,
                )

                _P4E_NEED[(H, W, render_batch)] = p4e_state["need"]
            frames.append(rgb)
        return np.concatenate(frames)[:n]
    return np.concatenate(outs)[:n]


