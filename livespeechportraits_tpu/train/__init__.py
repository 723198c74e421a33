from livespeechportraits_tpu.train import (  # noqa: F401
    datasets,
    schedulers,
    state,
    steps,
)
