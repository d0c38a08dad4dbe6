"""Orbax checkpoint save/restore roundtrip + resume metadata."""

import jax
import jax.numpy as jnp
import numpy as np

from repurpose_tpu.config import ModelConfig, TrainConfig
from repurpose_tpu.train.checkpoint import Checkpointer
from repurpose_tpu.train.state import create_train_state

TINY = ModelConfig(
    vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
    num_heads=2, d_ff=32, hidden_dim=8,
)


def test_save_restore_roundtrip(tmp_path):
    state, _, _ = create_train_state(TINY, TrainConfig(), 10, jax.random.key(0))
    state = state.replace(step=jnp.int32(42))
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(42, state, {"epoch": 3, "best_tiou": 0.5})
    assert ckpt.latest_step() == 42

    fresh, _, _ = create_train_state(TINY, TrainConfig(), 10, jax.random.key(1))
    restored, meta = ckpt.restore(fresh)
    assert meta == {"epoch": 3, "best_tiou": 0.5}
    assert int(restored.step) == 42
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()


def test_max_to_keep(tmp_path):
    state, _, _ = create_train_state(TINY, TrainConfig(), 10, jax.random.key(0))
    ckpt = Checkpointer(str(tmp_path / "ckpt"), max_to_keep=2)
    for s in (1, 2, 3):
        ckpt.save(s, state.replace(step=jnp.int32(s)), {"epoch": s})
    assert ckpt.latest_step() == 3
    restored, meta = ckpt.restore(state)
    assert meta["epoch"] == 3
    # the named behavior: old steps are actually PRUNED
    assert sorted(ckpt._mgr.all_steps()) == [2, 3]
    ckpt.close()


def test_same_step_resave_overwrites_metadata(tmp_path):
    """Best-checkpoint saves can land on the step the periodic save just
    wrote (no train step in between) — must overwrite, not raise
    StepAlreadyExistsError (orbax 0.11 default)."""
    state, _, _ = create_train_state(TINY, TrainConfig(), 2, jax.random.key(0))
    ck = Checkpointer(str(tmp_path / "ck"))
    ck.save(0, state, {"epoch": 1})
    ck.save(0, state, {"epoch": 1, "best": True})  # same step, richer meta
    _, meta = ck.restore(state, 0)
    assert meta.get("best") is True
    ck.close()


def test_restore_without_metadata_item(tmp_path):
    """save(metadata=None) writes no "meta" item; restore must probe the
    step's item set and skip JsonRestore instead of raising KeyError (and
    must not blanket-retry, which would mask real restore failures)."""
    state, _, _ = create_train_state(TINY, TrainConfig(), 10, jax.random.key(0))
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(7, state)  # no metadata
    fresh, _, _ = create_train_state(TINY, TrainConfig(), 10, jax.random.key(1))
    restored, meta = ckpt.restore(fresh)
    assert meta == {}
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()
