"""repurpose-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for long-to-short
video repurposing, built from scratch with the capabilities of the PyTorch
reference YosubShin/Repurpose (AAAI-25, Repurpose-10K).

Subpackages
-----------
- ``config``     : typed config system, loads the reference YAML schema.
- ``data``       : label/offset generation, dataset, bucketed static-shape batching.
- ``models``     : Flax multimodal temporal transformer (MMCT) + heads.
- ``ops``        : focal/DIoU losses, Soft-NMS (oracle + TPU), decode, attention kernels.
- ``parallel``   : device-mesh setup, sharding rules (dp/tp/sp), collective self-check.
- ``train``      : optimizer/schedule, train step, train/eval loops, checkpointing.
- ``utils``      : tIoU/AP/recall metrics, logging, profiling.
- ``extractors`` : batched JAX feature extractors (CLIP / CNN14 / MiniLM).
"""

__version__ = "0.1.0"

from repurpose_tpu.config import Config, load_config  # noqa: F401
