from livespeechportraits_tpu.parallel import mesh, multihost, sharding  # noqa: F401
