"""Measure the host->device upload wall per training batch, before and
after the batch diet (shared candidates once + uint8 targets + no mask +
device-resident audio bank).

The reference's data path never pays this wall twice: candidates load
once per subject (face_dataset.py:119-129) and targets are uint8 jpgs
(face_dataset.py:190-193).  Shipping per-sample f32 copies across a thin
host link (this harness: an ~8 MB/s relay) made every 512^2 campaign
upload-bound; this tool records the actual bytes/step and seconds/step
for both formats so the win is a measured number, not a claim.

Usage:
    python tools/upload_diet.py [--image_size 512] [--batch 16] [--reps 3]

Prints one JSON line per (task, format) row.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def _sync(tree):
    import jax
    import jax.numpy as jnp

    leaves = jax.tree.leaves(tree)
    # tiny scalar fetch as a true barrier (block_until_ready can return
    # early on the relay backend; see CLAUDE.md)
    for x in leaves[-1:]:
        float(jnp.sum(x.ravel()[:1]).astype(jnp.float32))


def _time_place(batches, place, reps, skip_cached_cand=False):
    """Median seconds + bytes of one batch placement.  The first batch is
    an untimed warm-up (it pays the one-off shared-candidate upload that
    trainer._place_batch then caches); with skip_cached_cand the cached
    [1, ...] cand_image is excluded from the per-step byte count and
    returned separately as bytes-once."""
    times, nbytes, once = [], 0, 0
    for i, b in enumerate(batches):
        if i > reps:
            break
        per_step = dict(b)
        if skip_cached_cand:
            c = per_step.get("cand_image")
            if c is not None and c.ndim == 4 and c.shape[0] == 1:
                once = c.nbytes
                del per_step["cand_image"]
        t0 = time.time()
        placed = place(b)
        _sync(placed)
        if i > 0:  # batch 0 warms the cand cache
            times.append(time.time() - t0)
            nbytes = sum(v.nbytes for v in per_step.values())
    return float(np.median(times)), nbytes, once


def bench_f2f(image_size: int, batch: int, reps: int):
    import train as train_cli
    from livespeechportraits_tpu.train import trainer

    rows = []
    # diet = the production path (load_face_clip defaults: no weight mask,
    # shared cand, u8 targets); legacy = the pre-diet per-sample f32 format
    for fmt, kw in (("diet", dict(emit_weight_mask=False)),
                    ("legacy", dict(shared_cand=False, u8_targets=False))):
        # sample_len is (n_frames - 60) + 1 at frame_jump 1: pad so the
        # sampler yields reps+1 full batches under drop_last (first batch
        # is the untimed cand-cache warm-up)
        sampler = train_cli.synthetic_face_data(
            batch * (reps + 1) + 62, image_size, device_rasterize=True)
        assert len(sampler) >= batch * (reps + 1), len(sampler)
        for k, v in kw.items():
            setattr(sampler, k, v)
        rng = np.random.default_rng(0)
        it = sampler.batches(batch, rng)
        med, nbytes, once = _time_place(
            it, lambda b: trainer._place_batch(b, None), reps,
            skip_cached_cand=(fmt == "diet"))
        rows.append({"task": "feature2face", "format": fmt,
                     "image_size": image_size, "batch": batch,
                     "bytes_per_step": int(nbytes),
                     "upload_s_per_step": round(med, 3),
                     "cand_bytes_once": int(once)})
    return rows


def bench_a2h(batch: int, reps: int, T: int = 3600, F: int = 1024):
    import jax

    from livespeechportraits_tpu.train import datasets, trainer

    rng = np.random.default_rng(0)
    clip = datasets.make_clip(
        audio_features=rng.normal(size=(2 * T, F)).astype(np.float32),
        pts3d=rng.normal(size=(T, 73, 3)).astype(np.float32),
        rot_angles=rng.uniform(-10, 10, (T, 3)).astype(np.float32),
        trans=rng.normal(size=(T, 3)).astype(np.float32),
    )
    rows = []
    for fmt, dev_audio in (("diet", True), ("legacy", False)):
        s = datasets.AudioVisualSampler([clip], task="audio2headpose",
                                        target_length=240,
                                        receptive_field=255, frame_future=15,
                                        device_audio=dev_audio)
        bank_s = 0.0
        if dev_audio:
            t0 = time.time()
            bank = jax.device_put(s.audio_bank)
            _sync(bank)
            bank_s = time.time() - t0
        it = s.batches(batch, np.random.default_rng(1))
        med, nbytes, _ = _time_place(
            it, lambda b: trainer._place_batch(b, None), reps)
        rows.append({"task": "audio2headpose", "format": fmt, "batch": batch,
                     "bytes_per_step": int(nbytes),
                     "upload_s_per_step": round(med, 3),
                     "bank_upload_once_s": round(bank_s, 3),
                     "bank_bytes_once": int(s.audio_bank.nbytes)
                     if dev_audio else 0})
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tasks", default="feature2face,audio2headpose")
    args = ap.parse_args()

    from livespeechportraits_tpu.utils import compile_cache

    compile_cache.enable()
    rows = []
    if "feature2face" in args.tasks:
        rows += bench_f2f(args.image_size, args.batch, args.reps)
    if "audio2headpose" in args.tasks:
        rows += bench_a2h(args.batch, args.reps)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
