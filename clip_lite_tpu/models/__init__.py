from clip_lite_tpu.models import resnet  # noqa: F401
from clip_lite_tpu.models import zoo  # noqa: F401  (registers zoo:: backbones)
