from clip_lite_tpu.models import resnet  # noqa: F401
