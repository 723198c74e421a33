"""Model registry.

Replaces the reference's importlib-reflection factories
(models/__init__.py:29-71 `find_model_using_name` / `create_model`) with an
explicit mapping - no dynamic imports, every entry is a (init, apply) pair
of pure functions over a params pytree.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

from livespeechportraits_tpu.models import (  # noqa: F401
    apc,
    audio2feature,
    audio2headpose,
    feature2face,
    losses,
    nn_core,
    wavenet,
)


class ModelDef(NamedTuple):
    init: Callable[..., Dict[str, Any]]
    apply: Callable[..., Any]


REGISTRY: Dict[str, ModelDef] = {
    "apc": ModelDef(apc.init_apc, apc.apply_apc),
    "audio2feature": ModelDef(
        audio2feature.init_audio2feature, audio2feature.apply_audio2feature
    ),
    "audio2headpose": ModelDef(
        audio2headpose.init_audio2headpose, audio2headpose.apply_audio2headpose
    ),
    "audio2headpose_lstm": ModelDef(
        audio2headpose.init_audio2headpose_lstm,
        audio2headpose.apply_audio2headpose_lstm,
    ),
    "feature2face": ModelDef(feature2face.init_generator, feature2face.apply_generator),
    "feature2face_d": ModelDef(
        feature2face.init_discriminator, feature2face.apply_discriminator
    ),
}


def create_model(name: str) -> ModelDef:
    """Look up a model family by name (create_model parity)."""
    try:
        return REGISTRY[name.lower()]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(REGISTRY)}"
        ) from None
