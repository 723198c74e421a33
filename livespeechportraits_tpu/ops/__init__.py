from livespeechportraits_tpu.ops import (  # noqa: F401
    augment,
    geometry,
    gmm,
    manifold,
    mel,
    rasterize,
    rasterize_pallas,
    smoothing,
)
