from repurpose_tpu.utils.metrics import (  # noqa: F401
    calculate_ap,
    calculate_recall,
    calculate_tiou,
)
