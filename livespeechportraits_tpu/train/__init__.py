from livespeechportraits_tpu.train import (  # noqa: F401
    data_io,
    datasets,
    prefetch,
    schedulers,
    state,
    steps,
    trainer,
)
