from livespeechportraits_tpu.pipeline import animate, assets, video  # noqa: F401
