"""Config system: reference-YAML compatibility, tpu overrides, validation."""

import pytest

from repurpose_tpu.config import Config, MeshConfig, ModelConfig, load_config


def test_reference_yaml_loads_unchanged(tmp_path):
    # The exact schema of the reference's configs/Repurpose.yaml.
    (tmp_path / "ref.yaml").write_text(
        """
train_dataset: {label_path: data/train.json, video_path: v, audio_path: a, text_path: t}
val_dataset: {label_path: data/val.json, video_path: v, audio_path: a, text_path: t}
test_dataset: {label_path: data/test.json, video_path: v, audio_path: a, text_path: t}
model: {vis_dim: 512, aud_dim: 2048, text_dim: 384, d_model: 512,
        self_num_layers: 16, text_num_layers: 3, cross_num_layers: 3, num_heads: 8}
train: {seed: 1234, lr: 0.001, epochs: 50, weight_decay: 0.0001, warmup_epochs: 0,
        save_epochs: 5, batch_size: 6, eval_freq: 1, intra_epoch_eval_freq: 50}
distributed: {strategy: auto, backend: nccl, timeout: 1800, find_unused_parameters: true}
test_cfg: {pre_nms_topk: 1000, pre_nms_thresh: 0.5, duration_thresh: 10,
           duration_thresh_max: 90, max_seg_per_min: 0.3, nms_sigma: 0.5, min_score: 0.01}
"""
    )
    cfg = load_config(str(tmp_path / "ref.yaml"))
    assert cfg.model.d_model == 512 and cfg.model.self_num_layers == 16
    assert cfg.model.concat_dim == 2944
    assert cfg.train.batch_size == 6 and cfg.train.seed == 1234
    assert cfg.test_cfg.pre_nms_topk == 1000
    assert cfg.train_dataset.label_path == "data/train.json"


def test_tpu_section_overrides():
    cfg = load_config(
        {
            "tpu": {
                "mesh": {"data": 4, "model": 2},
                "buckets": [128, 512],
                "compute_dtype": "float32",
                "remat": True,
                "loss_norm": "batch_size",
            }
        }
    )
    assert cfg.mesh.data == 4 and cfg.mesh.model == 2
    assert cfg.train.buckets == (128, 512)
    assert cfg.model.compute_dtype == "float32" and cfg.model.remat
    assert cfg.train.loss_norm == "batch_size"


def test_defaults_roundtrip_json():
    cfg = Config()
    assert "d_model" in cfg.to_json()


def test_unknown_keys_rejected():
    with pytest.raises(ValueError, match="unknown keys"):
        load_config({"train": {"learning_rate": 1e-3}})


def test_validation():
    with pytest.raises(ValueError):
        ModelConfig(d_model=100, num_heads=7)
    with pytest.raises(ValueError):
        load_config({"train": {"buckets": [512, 128]}})  # not sorted
    with pytest.raises(ValueError):
        MeshConfig(data=-1, model=-1).axis_sizes(8)  # two free axes


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """Persistent-cache helper points JAX at the dir and persists programs
    across a cache flush (docs/SERVING.md serving cold-start fix)."""
    import jax
    import jax.numpy as jnp

    from repurpose_tpu.utils.platform import enable_compilation_cache

    d = str(tmp_path / "xla_cache")
    got = enable_compilation_cache(d)
    assert got == d
    import os

    assert os.path.isdir(d)
    try:
        jax.clear_caches()
        jnp.tanh(jnp.arange(7.0) * 3).block_until_ready()
        assert os.listdir(d), "compiled program should be written to the cache dir"
    finally:
        # tmp_path is deleted after the test; don't leave the process
        # pointed at a dead cache dir — and restore the thresholds
        # enable_compilation_cache zeroed, or later tests in this process
        # would cache every trivial program (cross-test state bleed)
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def test_longvideo_config_loads():
    """configs/longvideo.yaml: the multi-hour preset parses into valid
    configs (buckets to 32768 engage the streaming/HBM attention kernels,
    ops/flash_attention.py; remat on for long-T training)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "configs", "longvideo.yaml")
    cfg = load_config(path)
    assert cfg.train.buckets[-1] == 32768
    assert cfg.model.remat is True
    assert cfg.train.batch_size == 1


def test_packed_config_loads():
    """configs/packed.yaml: the sequence-packing preset parses into valid
    configs (pack_sequences with the required n_real loss normalization —
    the Trainer rejects packing with config_batch_size, train/loop.py)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "configs", "packed.yaml")
    cfg = load_config(path)
    assert cfg.train.pack_sequences is True
    assert cfg.train.loss_norm == "batch_size"
    assert cfg.model.attention_impl != "ring"
