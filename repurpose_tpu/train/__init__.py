from repurpose_tpu.train.schedule import warmup_cosine_schedule  # noqa: F401
from repurpose_tpu.train.state import TrainState, create_train_state  # noqa: F401
from repurpose_tpu.train.step import make_eval_step, make_train_step  # noqa: F401
