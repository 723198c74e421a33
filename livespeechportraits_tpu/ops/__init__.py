from livespeechportraits_tpu.ops import (  # noqa: F401
    geometry,
    gmm,
    manifold,
    mel,
    rasterize,
    smoothing,
)
