from repurpose_tpu.models.mmct import MMCT  # noqa: F401
from repurpose_tpu.models.torch_convert import convert_reference_state_dict  # noqa: F401
