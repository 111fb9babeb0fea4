from clip_lite_tpu.ops import layers, loss  # noqa: F401
