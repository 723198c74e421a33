"""LiveSpeechPortraits-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
real-time photorealistic audio-driven talking-head generation.

Re-designed from scratch against the capabilities of
``YuanxunLu/LiveSpeechPortraits`` (SIGGRAPH Asia 2021).  The pipeline:

    wav -> log-mel (120 Hz)  -> APC GRU encoder -> LLE manifold projection
        -> Audio2Feature (mouth 3D landmark deltas, LSTM)
        -> Audio2Headpose (autoregressive conditional WaveNet + GMM sampling)
        -> geometry post-processing (smoothing / AMP / projection)
        -> Feature2Face (pix2pixHD-style U-Net renderer, 512x512 @ 60 FPS)

Everything device-side is pure JAX (jit / lax.scan / pjit over a
``jax.sharding.Mesh``); host-side IO (video muxing, HTML reports) mirrors the
reference's product surface.
"""

__version__ = "0.1.0"

from livespeechportraits_tpu.config import (  # noqa: F401
    APCConfig,
    Audio2FeatureConfig,
    Audio2HeadposeConfig,
    Feature2FaceConfig,
    PersonConfig,
    PipelineConfig,
    load_person_config,
)


def animate(*args, **kwargs):
    """Top-level convenience re-export of pipeline.animate.animate."""
    from livespeechportraits_tpu.pipeline.animate import animate as _animate

    return _animate(*args, **kwargs)


def __getattr__(name):
    # lazy heavyweight exports: Predictor, StreamingAnimator, make_synthetic_person
    if name == "Predictor":
        from livespeechportraits_tpu.serve import Predictor

        return Predictor
    if name == "StreamingAnimator":
        from livespeechportraits_tpu.pipeline.streaming import StreamingAnimator

        return StreamingAnimator
    if name == "make_synthetic_person":
        from livespeechportraits_tpu.pipeline.assets import make_synthetic_person

        return make_synthetic_person
    if name == "quantize_person_models":
        from livespeechportraits_tpu.pipeline.assets import quantize_person_models

        return quantize_person_models
    if name == "load_trained_person_models":
        from livespeechportraits_tpu.pipeline.assets import (
            load_trained_person_models,
        )

        return load_trained_person_models
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
