"""clip_lite_tpu: TPU-native vision-language contrastive pretraining.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
CLIP-Lite reference (arXiv 2112.07133): JSD InfoMax pretraining of an image
tower + text tower on image-caption pairs, with the full downstream
evaluation suite (retrieval, zero-shot, linear probe, VOC07 SVM) and
SPMD data-parallel training over a TPU device mesh.
"""

__version__ = "0.1.0"

from clip_lite_tpu.config import Config, ConfigNode  # noqa: F401
