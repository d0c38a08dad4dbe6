"""Typed configuration system.

Loads the reference's YAML schema (``/root/reference/configs/Repurpose.yaml`` —
sections ``train_dataset / val_dataset / test_dataset / model / train /
distributed / test_cfg``) into validated dataclasses, so a user of the
reference can point this framework at the same config file unchanged.

TPU-specific knobs (mesh axes, length buckets, compute dtype) have defaults
chosen for v5e and may be overridden with an optional ``tpu:`` section.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

import yaml


@dataclass(frozen=True)
class DatasetConfig:
    """Paths for one split (reference: configs/Repurpose.yaml:1-21)."""

    label_path: str = ""
    video_path: str = ""
    audio_path: str = ""
    text_path: str = ""


@dataclass(frozen=True)
class ModelConfig:
    """MMCT architecture (reference: models/MMCTransformer.py:26-96).

    ``text_num_layers`` / ``cross_num_layers`` are accepted for config
    compatibility; like the reference (MMCTransformer.py:26, which accepts but
    never uses them), the shipped concat-fusion model ignores them.
    """

    vis_dim: int = 512
    aud_dim: int = 2048
    text_dim: int = 384
    d_model: int = 512
    self_num_layers: int = 16
    text_num_layers: int = 3
    cross_num_layers: int = 3
    num_heads: int = 8
    d_ff: int = 2048
    hidden_dim: int = 256
    dropout: float = 0.1
    max_len: int = 5000
    # TPU-native additions (not in the reference schema):
    compute_dtype: str = "bfloat16"  # activations; params stay float32
    attention_impl: str = "auto"  # "auto" | "xla" | "pallas" | "pallas_full" | "ring"
    remat: bool = False  # jax.checkpoint each encoder layer
    matmul_precision: str = "default"
    """XLA dot precision: "default" lets the backend use fast reduced-precision
    passes (bf16 on the MXU); "highest" forces true float32 accumulation —
    required for bit-level parity against the fp32 torch reference."""
    attn_softmax_dtype: str = "bfloat16"
    """Element dtype of the [Tq, T] softmax-interior buffers in the Pallas
    attention kernels (scores still accumulate float32 on the MXU, the
    denominator/LSE stay float32). bfloat16 halves the interior's VMEM
    traffic — measured ~3% on the T=2048 model forward on v5e (the VPU ALU
    rate itself is dtype-independent) at ~1e-3 relative output error.
    Parity modes set "float32" (every golden test pins it or uses the XLA
    path, which ignores this knob)."""
    modalities: tuple[str, ...] = ("visual", "audio", "text")
    """Modality ablation: which feature streams feed the fusion concat
    (e.g. ("visual",) for visual-only). Disabled streams are dropped before
    the input projection, so ablated models are smaller, not zero-padded."""
    reg_activation: str = "relu"
    """Final activation of the boundary-regression head. "relu" matches the
    reference (models/MMCTransformer.py:92) but its zero-gradient region can
    leave offset units permanently dead when the reg loss is enabled;
    "softplus" is the recommended smooth alternative for real reg training."""
    fusion: str = "concat"
    """"concat" = the reference's shipped early-fusion MMCT; "cross" = the
    cross-modal attention architecture its unused models/transformer.py
    library and text_num_layers/cross_num_layers knobs describe
    (models.cross_modal.MMCTCross); "bottleneck" = MBT-style bottleneck-token
    fusion (models.bottleneck.MMCTBottleneck, arXiv 2107.00135)."""

    @property
    def concat_dim(self) -> int:
        dims = {"visual": self.vis_dim, "audio": self.aud_dim, "text": self.text_dim}
        return sum(dims[m] for m in self.modalities)

    def __post_init__(self) -> None:
        if self.d_model % self.num_heads != 0:
            raise ValueError(
                f"d_model={self.d_model} not divisible by num_heads={self.num_heads}"
            )
        bad = set(self.modalities) - {"visual", "audio", "text"}
        if bad or not self.modalities:
            raise ValueError(f"bad modalities: {self.modalities}")
        object.__setattr__(self, "modalities", tuple(self.modalities))
        if self.reg_activation not in ("relu", "softplus"):
            raise ValueError(f"bad reg_activation: {self.reg_activation}")
        if self.fusion not in ("concat", "cross", "bottleneck"):
            raise ValueError(f"bad fusion: {self.fusion}")
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"bad compute_dtype: {self.compute_dtype}")
        if self.attention_impl not in ("auto", "xla", "pallas", "pallas_full", "ring"):
            raise ValueError(f"bad attention_impl: {self.attention_impl}")
        if self.matmul_precision not in ("default", "float32", "highest"):
            raise ValueError(f"bad matmul_precision: {self.matmul_precision}")
        if self.attn_softmax_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"bad attn_softmax_dtype: {self.attn_softmax_dtype}")


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: configs/Repurpose.yaml:33-44)."""

    seed: int = 1234
    lr: float = 1e-3
    epochs: int = 50
    weight_decay: float = 1e-4
    warmup_epochs: int = 0
    save_epochs: int = 5
    batch_size: int = 6
    eval_freq: int = 1
    intra_epoch_eval_freq: int = 50
    # TPU-native additions:
    buckets: tuple[int, ...] = (256, 512, 1024, 2048)
    """Static sequence-length buckets; each batch is padded to the smallest
    bucket >= its longest sample, so XLA compiles one program per bucket
    (replaces the reference's pad-to-batch-max at dataset/RepurposeClip.py:449-533)."""
    loss_norm: str = "config_batch_size"
    """"config_batch_size" reproduces the reference quirk of dividing the summed
    focal loss by the *configured* batch size even for ragged final batches
    (main.py:331); "batch_size" divides by the actual (non-padding) sample
    count of the global batch."""
    reg_loss_weight: float = 0.0
    """Weight on the DIoU boundary-regression loss. The reference defines
    ctr_diou_loss_1d (models/losses.py:56) but trains with cls loss only
    (main.py:664 'Regression loss removed'); 0.0 reproduces that."""
    pack_sequences: bool = False
    """Sequence packing: first-fit-decreasing several videos into each row of
    the LARGEST bucket with block-diagonal attention + per-video positional
    encoding (data/batching.py:pack_batch — exact vs unpacked,
    tests/test_packing.py). batch_size then counts rows; use
    loss_norm="batch_size" so the loss normalizes by the true video count
    (config_batch_size would divide by rows). The reference has no packing —
    it pads every video to the batch max (dataset/RepurposeClip.py:449-533)."""
    pipeline_microbatches: int = 2
    """Pipeline microbatches per step when the mesh has a ``pipe`` axis > 1
    (parallel/pipeline.py). More microbatches shrink the pipeline bubble
    ((stages-1)/(microbatches+stages-1)) at the cost of smaller per-stage
    matmuls; the global batch must be a multiple of
    data_axis x microbatches, and the stage count must divide
    self_num_layers. Ignored on pipe=1 meshes."""
    pipeline_schedule: str = "1f1b"
    """Pipeline schedule on pipe > 1 meshes. "1f1b" (default; one-forward-
    one-backward, parallel/pipeline_1f1b.py) bounds in-flight activations at
    O(stages) regardless of microbatch count — more microbatches shrink the
    bubble for free. "gpipe" (parallel/pipeline.py) banks all microbatches'
    activations (O(microbatches)); autodiff runs its reverse schedule, which
    makes it the simpler reference implementation (eval always rides its
    forward). Both compose with data and tensor parallelism."""
    grad_accum_steps: int = 1
    """Gradient accumulation: split each batch into this many chunks along
    the batch dim and scan the backward, summing grads before ONE optimizer
    update (train/step.py:_accum_grads). Trains identically to the unsplit
    step (global loss denominator; reduction order aside) with peak
    activation memory of one chunk — the standard large-effective-batch
    lever the reference lacks (its loop is one backward per batch,
    main.py:294-412). batch_size must be divisible by it."""
    shard_opt_state: bool = False
    """ZeRO-1: shard the Adam moments over the mesh's ``data`` axis
    (parallel/sharding.py:zero1_opt_specs — composes with the Megatron TP
    placement of TP-sharded params' moments). Cuts optimizer-state HBM ~dp x
    for the cost of the update-time all-gather; the reference's DDP
    replicates moments on every rank. No effect on data=1 meshes."""
    grad_accum_dtype: str = "float32"
    """Accumulator dtype for grad_accum_steps > 1. Measured a dead lever on
    v5e at flagship dims (b8/t2048, accum=2): bfloat16 accumulators save
    16 MB of a 3206 MB compiled temp allocation (0.5%; XLA's buffer
    assignment reuses the accumulator slabs either way) and are speed-neutral
    (0.989x, BENCH_r04 train_accum). Kept for the grad-noise/HBM trade at
    much larger param counts; keep fp32 for parity tests."""
    rng_impl: str = "rbg"
    """PRNG for the per-step dropout keys. "rbg" (XLA RngBitGenerator) makes
    the flagship train step 30% faster on v5e than JAX's default threefry
    (85 vs 121 ms at bucket 2048 — dropout generates ~50 masks of [B,T,512]
    random bits per step; tools/bench_trainstep_parts.py). rbg is
    deterministic per (key, program, backend) but its bits can differ across
    mesh layouts/backends; use "threefry" for bitwise trajectory equivalence
    across dp/tp/sp layouts (tests/test_sharding.py pins it)."""

    def __post_init__(self) -> None:
        if not self.buckets or list(self.buckets) != sorted(set(self.buckets)):
            raise ValueError(f"buckets must be sorted unique, got {self.buckets}")
        if self.loss_norm not in ("config_batch_size", "batch_size"):
            raise ValueError(f"bad loss_norm: {self.loss_norm}")
        if self.rng_impl not in ("rbg", "threefry"):
            raise ValueError(f"bad rng_impl: {self.rng_impl}")
        if self.pipeline_microbatches < 1:
            raise ValueError(
                f"pipeline_microbatches must be >= 1, got {self.pipeline_microbatches}"
            )
        if self.pipeline_schedule not in ("gpipe", "1f1b"):
            raise ValueError(f"bad pipeline_schedule: {self.pipeline_schedule}")
        if self.grad_accum_steps < 1:
            raise ValueError(f"grad_accum_steps must be >= 1, got {self.grad_accum_steps}")
        if self.grad_accum_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"bad grad_accum_dtype: {self.grad_accum_dtype}")
        if self.grad_accum_steps > 1 and self.batch_size % self.grad_accum_steps:
            raise ValueError(
                f"batch_size {self.batch_size} not divisible by "
                f"grad_accum_steps {self.grad_accum_steps}"
            )


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. Replaces the reference's MultiGPUStrategy
    (utils/distributed.py:242-353): the single/dp/ddp strategy zoo collapses
    into one ``jax.sharding.Mesh``; -1 means "all remaining devices"."""

    data: int = -1
    model: int = 1
    seq: int = 1
    pipe: int = 1
    """Pipeline stages (parallel/pipeline.py) — the encoder's layer stack
    sharded over this axis, microbatches streamed GPipe-style. Capability
    the reference lacks (its parallelism is DP/DDP only)."""

    def axis_sizes(self, n_devices: int) -> tuple[int, int, int, int]:
        sizes = [self.data, self.model, self.seq, self.pipe]
        n_fixed = 1
        free = None
        for i, s in enumerate(sizes):
            if s == -1:
                if free is not None:
                    raise ValueError("only one mesh axis may be -1")
                free = i
            else:
                n_fixed *= s
        if free is not None:
            if n_devices % n_fixed != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes {n_fixed}"
                )
            sizes[free] = n_devices // n_fixed
        if sizes[0] * sizes[1] * sizes[2] * sizes[3] != n_devices:
            raise ValueError(
                f"mesh {tuple(sizes)} does not cover {n_devices} devices"
            )
        return tuple(sizes)  # type: ignore[return-value]


@dataclass(frozen=True)
class TestConfig:
    """Inference/decode settings (reference: configs/Repurpose.yaml:52-61)."""

    # Not a pytest test class despite the Test* name (silences
    # PytestCollectionWarning wherever tests import it).
    __test__ = False

    pre_nms_topk: int = 1000
    pre_nms_thresh: float = 0.5
    duration_thresh: float = 10.0
    duration_thresh_max: float = 90.0
    max_seg_per_min: float = 0.3
    nms_sigma: float = 0.5
    min_score: float = 0.01


@dataclass(frozen=True)
class Config:
    train_dataset: DatasetConfig = field(default_factory=DatasetConfig)
    val_dataset: DatasetConfig = field(default_factory=DatasetConfig)
    test_dataset: DatasetConfig = field(default_factory=DatasetConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    test_cfg: TestConfig = field(default_factory=TestConfig)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)


def _build(cls, raw: Mapping[str, Any], *, extra_keys: Sequence[str] = ()):
    """Construct a dataclass from a raw mapping, ignoring listed extra keys and
    erroring on unknown ones (typo safety the reference's raw-dict config lacks)."""
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(raw) - names - set(extra_keys)
    if unknown:
        raise ValueError(f"unknown keys for {cls.__name__}: {sorted(unknown)}")
    kwargs = {k: v for k, v in raw.items() if k in names}
    if "buckets" in kwargs and kwargs["buckets"] is not None:
        kwargs["buckets"] = tuple(kwargs["buckets"])
    return cls(**kwargs)


def load_config(path_or_dict: str | Mapping[str, Any]) -> Config:
    """Load a reference-schema YAML file (or an already-parsed dict).

    The reference's ``distributed:`` section (strategy/backend/timeout/
    find_unused_parameters — configs/Repurpose.yaml:45-51) describes
    NCCL/DDP machinery with no TPU equivalent; it is accepted and ignored.
    An optional ``tpu:`` section may set mesh axes and override model/train
    TPU knobs.
    """
    if isinstance(path_or_dict, Mapping):
        raw = dict(path_or_dict)
    else:
        with open(path_or_dict) as f:
            raw = yaml.safe_load(f) or {}

    tpu = dict(raw.get("tpu") or {})
    model_raw = dict(raw.get("model") or {})
    model_raw.update(
        {
            k: tpu[k]
            for k in (
                "compute_dtype", "attention_impl", "remat",
                "matmul_precision", "modalities", "fusion", "reg_activation",
            )
            if k in tpu
        }
    )
    if "modalities" in model_raw and model_raw["modalities"] is not None:
        model_raw["modalities"] = tuple(model_raw["modalities"])
    train_raw = dict(raw.get("train") or {})
    train_raw.update(
        {k: tpu[k] for k in
         ("buckets", "loss_norm", "reg_loss_weight", "pack_sequences",
          "pipeline_microbatches", "pipeline_schedule", "grad_accum_steps",
          "grad_accum_dtype", "shard_opt_state") if k in tpu}
    )
    mesh_raw = {k: tpu[k] for k in ("data", "model", "seq", "pipe") if k in tpu}
    if "mesh" in tpu:
        mesh_raw = dict(tpu["mesh"])

    return Config(
        train_dataset=_build(DatasetConfig, raw.get("train_dataset") or {}),
        val_dataset=_build(DatasetConfig, raw.get("val_dataset") or {}),
        test_dataset=_build(DatasetConfig, raw.get("test_dataset") or {}),
        model=_build(ModelConfig, model_raw),
        train=_build(TrainConfig, train_raw),
        mesh=_build(MeshConfig, mesh_raw),
        test_cfg=_build(TestConfig, raw.get("test_cfg") or {}),
    )
