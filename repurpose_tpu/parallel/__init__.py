from repurpose_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    describe_mesh,
    mesh_self_check,
)
from repurpose_tpu.parallel.pipeline import (  # noqa: F401
    PipelinedMMCT,
    pipeline_forward,
)
from repurpose_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_sharding_rules,
    shard_params,
)
