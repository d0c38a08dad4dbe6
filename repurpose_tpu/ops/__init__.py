from repurpose_tpu.ops.losses import (  # noqa: F401
    ctr_diou_loss_1d,
    masked_cls_loss,
    sigmoid_focal_loss,
)
from repurpose_tpu.ops.softnms import soft_nms_cpu, soft_nms_tpu  # noqa: F401
