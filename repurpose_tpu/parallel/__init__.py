from repurpose_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    describe_mesh,
    mesh_self_check,
)
# NOTE: parallel.pipeline is intentionally NOT re-exported here — it pulls
# flax + the full models stack, which mesh/sharding-only consumers
# (preflight, __graft_entry__) shouldn't pay for on this 1-core box; import
# it lazily from repurpose_tpu.parallel.pipeline (as train/loop.py does).
from repurpose_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_sharding_rules,
    shard_params,
)
