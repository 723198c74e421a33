"""Checkpoint save/restore (orbax) + resume metadata.

Capability parity with BaseModel.save_networks/load_networks
(base_model.py:161-227: per-epoch `{epoch}_{name}.pkl` + `iter.txt`) on
TPU-native storage: each save is an orbax step directory holding the full
pytree (params + opt state + step); `iter.txt`-style resume metadata is
the orbax step index.  The torch .pkl ingestion path lives in
utils/torch_convert.py.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


def _checkpointer():
    if ocp is None:  # pragma: no cover
        raise RuntimeError("orbax-checkpoint unavailable")
    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, tree: Any, step: int) -> str:
    """Save a pytree under <ckpt_dir>/<step>/ (any nested dict/list of
    arrays; TrainStates included)."""
    path = os.path.join(os.path.abspath(ckpt_dir), str(int(step)))
    _checkpointer().save(path, jax.tree.map(np.asarray, tree), force=True)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def prefer_best(ckpt_dir: str) -> str:
    """Return ``<ckpt_dir>_best`` when the trainer kept a best-validation
    save there (TrainLoopConfig.save_best), else ``ckpt_dir`` unchanged.

    The reference serves whatever epoch its decay schedule ended on
    (models/__init__.py:74-104 keeps latest_/epoch saves only); with a
    best tracker the serving loader can always pick the val optimum.
    """
    if ckpt_dir:
        best = ckpt_dir.rstrip("/") + "_best"
        if latest_step(best) is not None:
            return best
    return ckpt_dir


def _rebuild(template: Any, restored: Any) -> Any:
    """Re-impose the template's container types onto a restored pytree.

    Orbax returns plain dicts/lists; NamedTuples (e.g. TrainState) come
    back as dicts keyed by field name, and naive flatten/unflatten would
    scramble leaves because dict keys sort differently from field order.
    """
    if hasattr(template, "_fields"):  # NamedTuple
        kwargs = {
            f: _rebuild(getattr(template, f), restored[f]) for f in template._fields
        }
        return type(template)(**kwargs)
    if isinstance(template, dict):
        # Mirror the sequence branch's "never silently truncate": restored
        # keys the template lacks are a config mismatch and must raise -
        # EXCEPT the known per-conv annotation leaves (QAT tags, baked
        # activation scales), which are deliberately droppable: restoring
        # a QAT/calibrated checkpoint into a plain float template is the
        # documented strip path (trainer.py / load_trained_person_models).
        extra = set(restored) - set(template) - {"fq", "fq8", "x_scale"}
        if extra:
            raise ValueError(
                f"checkpoint carries keys the template lacks: "
                f"{sorted(extra)[:5]} - architecture/config mismatch")
        return {k: _rebuild(v, restored[k]) for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        if isinstance(restored, dict):  # orbax may dict-ify sequences
            if len(restored) != len(template):
                # never silently truncate: a checkpoint with MORE entries
                # than the template (e.g. 'large' 2-res-block stages
                # restored into a 'normal' 1-block template) is a config
                # mismatch, not a prefix
                raise ValueError(
                    f"sequence length mismatch: template has "
                    f"{len(template)} entries, checkpoint has "
                    f"{len(restored)}")
            restored = [restored[str(i)] for i in range(len(template))]
        elif len(restored) != len(template):
            raise ValueError(
                f"sequence length mismatch: template has {len(template)} "
                f"entries, checkpoint has {len(restored)}")
        return type(template)(_rebuild(t, r) for t, r in zip(template, restored))
    return restored


def rebuild(template: Any, restored: Any) -> Any:
    """Re-nest a restored (plain-dict) subtree onto a template pytree -
    the `_rebuild` container-type fix-up, public for callers that restore
    a whole checkpoint and extract one piece (e.g. serving loads only the
    G params out of a dual-state GAN checkpoint)."""
    return _rebuild(template, restored)


def restore_checkpoint(ckpt_dir: str, step: Optional[int] = None,
                       template: Any = None) -> Any:
    """Restore the pytree saved at `step` (default: latest).  When a
    `template` pytree is given, restored values are re-nested into the
    template's container types (NamedTuples, tuples) by name/position."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), str(int(step)))
    restored = _checkpointer().restore(path)
    if template is not None:
        restored = _rebuild(template, restored)
    return restored
