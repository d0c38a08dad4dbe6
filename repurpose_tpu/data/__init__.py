from repurpose_tpu.data.labels import (  # noqa: F401
    generate_regression_offsets,
    generate_time_status_list,
)
