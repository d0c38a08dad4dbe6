"""GPipe-style pipeline parallelism over the ``pipe`` mesh axis.

The reference has NO pipeline parallelism — its parallelism story is
DP/DDP replication only (reference utils/distributed.py:242-625) — so this
module is a TPU-native capability addition, following the jax-ml
scaling-book recipe: shard the encoder's layer stack over a ``pipe`` mesh
axis, stream microbatches through the stages with ``jax.lax.ppermute``,
and let autodiff run the reverse schedule for the backward.

Design:

- Stage ``s`` holds encoder layers ``[s*L/S, (s+1)*L/S)`` as ONE stacked
  pytree (leading dim = layers-per-stage) applied with ``lax.scan`` — a
  single compiled layer body per stage.
- The batch splits into M microbatches LOCALLY on each data shard.
  Microbatch assignment is irrelevant to results (the loss sums
  per-sample terms), so the comms-free local split is always correct.
- GPipe schedule: ``M + S - 1`` steps. Stage 0 injects microbatch ``t``,
  stage ``S-1`` banks outputs from step ``S-1`` on, activations hop
  stages via a non-wrapping ppermute. Fill/drain steps compute on
  clamped microbatch indices and their results are discarded by
  predication — exact math, idle-bubble waste only
  (bubble fraction = (S-1)/(M+S-1)).
- Embed (projection + PE) and the heads run replicated on every pipe
  stage: they are O(one layer) of compute, and pipelining them would add
  two more transfer boundaries for no wall-clock win at 16 layers.
- Two parameter layouts: the default keeps the STANDARD per-layer tree
  (checkpoints, telemetry, and the torch converter unchanged; the stack +
  pipe-shard happens inside the jitted step as a local slice of the
  replicated tree — at the flagship's 85M params replication costs
  ~0.6 GB HBM, irrelevant on v5e). For much deeper variants,
  ``create_pipeline_train_state`` + ``PipelinedMMCTStacked`` hold the
  layer stack ONLY pipe-sharded (each stage stores its own L/S layers and
  Adam moments; ``merge_pipeline_params`` exports the standard tree).

Composition: pipe x data always; pipe x TENSOR PARALLELISM (``model``
axis) via partial-manual ``shard_map`` — the body is manual over
``data``/``pipe`` (explicit ppermute microbatch hops) while the ``model``
axis stays a compiler axis: each stage's layer scan runs inside
``jax.sharding.auto_axes(("model",))`` so GSPMD places the Megatron
column/row TP collectives (parallel/sharding.py rules) INSIDE the stage,
riding the model axis exactly as in the unpipelined TP path.
Restrictions (checked in ``validate_pipeline``): pipe>1 requires seq=1
(the ring ppermute would need hand-placed collectives in the body),
``attention_impl="xla"`` when model>1 (GSPMD cannot partition the Pallas
custom call over heads; XLA dots it can), concat fusion, no ring
attention, ``L % S == 0`` and ``B % (dp * M) == 0``.

With dropout ON, pipelined and unpipelined trajectories draw different
dropout masks (flax folds module paths into dropout keys; the pipeline
derives per-layer/per-microbatch keys by ``fold_in``) — same
distribution, different draws. Trajectory-equivalence tests therefore
run with dropout 0 (tests/test_pipeline.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.sharding import auto_axes

from repurpose_tpu.config import ModelConfig
from repurpose_tpu.models.encoder import EncoderLayer, dense_kw
from repurpose_tpu.models.mmct import MMCTOutput, _Head
from repurpose_tpu.models.positional import sinusoidal_positional_encoding

Array = jax.Array


def mesh_axis_sizes(mesh: Mesh) -> dict[str, int]:
    return dict(zip(mesh.axis_names, mesh.devices.shape))


def validate_pipeline(
    cfg: ModelConfig, mesh: Mesh, n_microbatches: int, batch: int
) -> tuple[int, int]:
    """Check the pipeline restrictions; returns (n_stages, data_parallel)."""
    ax = mesh_axis_sizes(mesh)
    s = ax.get("pipe", 1)
    dp = ax.get("data", 1)
    if ax.get("seq", 1) > 1:
        raise ValueError(
            "pipeline parallelism composes with the data and model axes "
            f"(mesh axes {ax}); set seq=1"
        )
    if ax.get("model", 1) > 1 and cfg.attention_impl != "xla":
        raise ValueError(
            "pipe x tensor parallelism needs attention_impl='xla' (GSPMD "
            f"partitions XLA dots over heads, not Pallas custom calls); got "
            f"{cfg.attention_impl!r}"
        )
    if cfg.fusion != "concat":
        raise ValueError(f"pipeline supports the concat-fusion MMCT, not {cfg.fusion!r}")
    if cfg.attention_impl == "ring":
        raise ValueError("ring attention needs the seq axis; use xla/pallas with pipe")
    if cfg.self_num_layers % s:
        raise ValueError(
            f"{cfg.self_num_layers} layers not divisible by {s} pipeline stages"
        )
    if n_microbatches < 1:
        raise ValueError("n_microbatches must be >= 1")
    if batch % (dp * n_microbatches):
        raise ValueError(
            f"batch {batch} not divisible by data axis {dp} x microbatches "
            f"{n_microbatches}"
        )
    return s, dp


def stack_layer_params(params: dict, n_layers: int):
    """[encoder/layer_0 .. layer_{L-1}] -> one pytree with leading dim L."""
    layers = [params["encoder"][f"layer_{i}"] for i in range(n_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked, n_layers: int) -> dict:
    """Inverse of ``stack_layer_params`` (checkpoint export for pre-stacked
    states)."""
    return {
        f"layer_{i}": jax.tree.map(lambda x, i=i: x[i], stacked)
        for i in range(n_layers)
    }


def stacked_param_specs(stacked) -> Any:
    """PartitionSpecs for the stacked layer tree: dim 0 (layers) over
    ``pipe``, the per-layer dims per the Megatron TP rules
    (parallel/sharding.py:param_sharding_rules) over ``model`` — e.g. the
    stacked qkv kernel [L, d, 3d] gets ``P("pipe", None, "model")``."""
    from repurpose_tpu.parallel.sharding import param_sharding_rules

    def rule(path, v):
        inner = param_sharding_rules(path, v)
        return P("pipe", *inner)

    return jax.tree_util.tree_map_with_path(rule, stacked)


def _compute_dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _embed(cfg: ModelConfig, params, visual, audio, text, positions):
    """concat -> input_projection -> input_norm -> +PE; bit-identical math to
    MMCT.__call__'s pre-encoder block (models/mmct.py:96-103) — the parity is
    pinned by tests/test_pipeline.py::test_forward_matches_unpipelined."""
    dtype = _compute_dtype(cfg)
    streams = {"visual": visual, "audio": audio, "text": text}
    x = jnp.concatenate([streams[m].astype(dtype) for m in cfg.modalities], axis=-1)
    x = nn.Dense(cfg.d_model, dtype=dtype, **dense_kw(cfg)).apply(
        {"params": params["input_projection"]}, x
    )
    x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32).apply(
        {"params": params["input_norm"]}, x
    )
    pe = sinusoidal_positional_encoding(x.shape[1], cfg.d_model)
    return (x + (pe[None] if positions is None else pe[positions])).astype(dtype)


def _head(cfg: ModelConfig, params, x, deterministic: bool, rng) -> MMCTOutput:
    """encoder_norm -> feature_map -> twin heads; mirrors MMCT.__call__'s
    post-encoder block (models/mmct.py:108-118), parity pinned by the same
    test as ``_embed``."""
    dtype = _compute_dtype(cfg)
    x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32).apply(
        {"params": params["encoder_norm"]}, x
    ).astype(dtype)
    f = nn.Dense(cfg.d_model, dtype=dtype, **dense_kw(cfg)).apply(
        {"params": params["feature_map"]}, x
    )
    f = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32).apply(
        {"params": params["feature_norm"]}, f
    ).astype(dtype)
    f = nn.relu(f)

    def rngs_for(tag: int):
        if deterministic:
            return None
        return {"dropout": jax.random.fold_in(rng, cfg.self_num_layers + tag)}

    drop = nn.Dropout(cfg.dropout, deterministic=deterministic)
    f = drop.apply({}, f, rngs=rngs_for(0))
    cls_logits = _Head(cfg, 1, final_relu=False).apply(
        {"params": params["cls_head"]}, f, deterministic, rngs=rngs_for(1)
    )
    offsets = _Head(cfg, 2, final_relu=True).apply(
        {"params": params["reg_head"]}, f, deterministic, rngs=rngs_for(2)
    )
    return MMCTOutput(cls_logits=cls_logits, offsets=offsets, feats=f)


def _pipeline_encoder(
    cfg: ModelConfig,
    mesh: Mesh,
    n_microbatches: int,
    stacked,
    x: Array,
    mask: Array,
    seg_ids: Array | None,
    rng,
    deterministic: bool,
) -> Array:
    """Run the encoder stack as an S-stage GPipe pipeline over ``mesh``'s
    pipe axis. ``x`` [B, T, d] data-sharded in, same sharding out.

    With ``model > 1`` (pipe x tensor parallelism) the shard_map is
    PARTIAL-MANUAL: ``axis_names={"data", "pipe"}`` keeps the microbatch
    ppermute hops explicit while the ``model`` axis stays a compiler axis —
    each stage's layer scan runs under ``auto_axes(("model",))`` so GSPMD
    partitions the qkv/FFN dots over heads and places the Megatron psums
    (parallel/sharding.py rules) INSIDE the stage."""
    ax = mesh_axis_sizes(mesh)
    s_stages = ax.get("pipe", 1)
    tp = ax.get("model", 1)
    lps = cfg.self_num_layers // s_stages
    m_micro = n_microbatches
    layer_mod = EncoderLayer(cfg)
    has_seg = seg_ids is not None
    det = deterministic

    def apply_layer(lp, x_, mask_, seg_, key):
        rngs = None if det else {"dropout": key}
        if has_seg:
            return layer_mod.apply({"params": lp}, x_, mask_, det, seg_, rngs=rngs)
        return layer_mod.apply({"params": lp}, x_, mask_, det, rngs=rngs)

    if cfg.remat:
        apply_layer = jax.checkpoint(apply_layer)

    # The dropout key rides through shard_map as raw uint32 data (typed key
    # arrays and their sharding specs don't mix reliably); the impl tag is
    # static, captured here. (pipeline_forward already rejects
    # deterministic=False without an rng.)
    if det:
        rng = jax.random.key(0)  # placeholder bits, never used
    key_impl = jax.random.key_impl(rng)
    raw_key = jax.random.key_data(rng)

    def stage_stack(layers_loc, x_, mask_, seg_, raw_loc, mb_idx, stage):
        """One stage's layer scan. Everything it touches from the manual
        context arrives as an ARGUMENT (not a closure) so the whole function
        can cross the ``auto_axes`` boundary under pipe x tp."""
        rng_loc = jax.random.wrap_key_data(raw_loc, impl=key_impl)

        def body(carry, inp):
            lp, li = inp
            key = None
            if not det:
                gli = stage * lps + li
                key = jax.random.fold_in(jax.random.fold_in(rng_loc, gli), mb_idx)
            return apply_layer(lp, carry, mask_, seg_, key), None

        out, _ = jax.lax.scan(body, x_, (layers_loc, jnp.arange(lps)))
        return out

    if tp > 1:
        # GSPMD owns the model axis inside the stage; activations enter and
        # leave replicated over it (row-parallel matmuls close each TP region
        # with a psum, exactly as in the unpipelined TP path).
        stage_stack = auto_axes(stage_stack, axes=("model",), out_sharding=P())

    def shard_body(layers_loc, x_loc, mask_loc, seg_loc, raw):
        stage = jax.lax.axis_index("pipe")
        # Fold the data-shard index in so dropout masks are iid across the
        # data axis (without this, every data shard would draw the same
        # masks — correlated noise the unpipelined dp path doesn't have).
        rng_loc = jax.random.fold_in(
            jax.random.wrap_key_data(raw, impl=key_impl),
            jax.lax.axis_index("data"),
        )
        raw_loc = jax.random.key_data(rng_loc)
        bl, t, d = x_loc.shape
        mb = bl // m_micro
        x_mb = x_loc.reshape(m_micro, mb, t, d)
        mask_mb = mask_loc.reshape(m_micro, mb, t)
        seg_mb = seg_loc.reshape(m_micro, mb, t) if has_seg else None

        def stage_fn(x_, mask_, seg_, mb_idx):
            return stage_stack(layers_loc, x_, mask_, seg_, raw_loc, mb_idx, stage)

        def step(carry, tstep):
            prev, outs = carry
            idx = jnp.clip(tstep - stage, 0, m_micro - 1)
            x_in = jax.lax.dynamic_index_in_dim(x_mb, idx, 0, keepdims=False)
            if s_stages > 1:
                x_in = jnp.where(stage == 0, x_in, prev)
            m_in = jax.lax.dynamic_index_in_dim(mask_mb, idx, 0, keepdims=False)
            s_in = (
                jax.lax.dynamic_index_in_dim(seg_mb, idx, 0, keepdims=False)
                if has_seg
                else None
            )
            out = stage_fn(x_in, m_in, s_in, idx)
            slot = jnp.clip(tstep - (s_stages - 1), 0, m_micro - 1)
            write = (stage == s_stages - 1) & (tstep >= s_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, slot, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, out, cur), slot, 0
            )
            if s_stages > 1:
                out = jax.lax.ppermute(
                    out, "pipe", [(i, i + 1) for i in range(s_stages - 1)]
                )
            return (out, outs), None

        # The zero-filled initial carries are replicated but every scan
        # output varies per device — pcast marks them varying so the
        # carry types match (shard_map VMA rule).
        varying = lambda z: jax.lax.pcast(z, ("data", "pipe"), to="varying")
        prev0 = varying(jnp.zeros((mb, t, d), x_loc.dtype))
        outs0 = varying(jnp.zeros((m_micro, mb, t, d), x_loc.dtype))
        (_, outs), _ = jax.lax.scan(
            step, (prev0, outs0), jnp.arange(m_micro + s_stages - 1)
        )
        if s_stages > 1:
            # Results live on the last stage only; the masked psum replicates
            # them across the pipe axis for the (replicated) head block.
            outs = jax.lax.psum(
                jnp.where(stage == s_stages - 1, outs, jnp.zeros_like(outs)), "pipe"
            )
        return outs.reshape(bl, t, d)

    sm_kw: dict[str, Any] = {}
    if tp > 1:
        # Partial-manual: data/pipe manual (explicit ppermute), model left to
        # GSPMD. Pin the Megatron layout on the stacked layer tree so the
        # auto-axis collectives land as column/row TP psums, not resharding.
        sm_kw["axis_names"] = {"data", "pipe"}
        specs = stacked_param_specs(stacked)
        stacked = jax.tree.map(
            lambda v, s: jax.lax.with_sharding_constraint(v, NamedSharding(mesh, s)),
            stacked,
            specs,
        )
    if has_seg:
        fn = jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P("pipe"), P("data"), P("data"), P("data"), P()),
            out_specs=P("data"),
            **sm_kw,
        )
        return fn(stacked, x, mask, seg_ids, raw_key)
    fn = jax.shard_map(
        lambda l, x_, m_, r_: shard_body(l, x_, m_, None, r_),
        mesh=mesh,
        in_specs=(P("pipe"), P("data"), P("data"), P()),
        out_specs=P("data"),
        **sm_kw,
    )
    return fn(stacked, x, mask, raw_key)


def split_pipeline_params(params, n_layers: int) -> dict:
    """Standard MMCT param tree -> ``{"layers": stacked [L, ...],
    "rest": everything-but-encoder}`` — the memory-honest pipeline layout
    where each stage holds ONLY its own layers (pipe-sharded dim 0)."""
    return {
        "layers": stack_layer_params(params, n_layers),
        "rest": {k: v for k, v in params.items() if k != "encoder"},
    }


def merge_pipeline_params(pp: dict, n_layers: int) -> dict:
    """Inverse of ``split_pipeline_params`` — standard-tree export for
    checkpoints / the torch converter / the decode pipeline."""
    params = dict(pp["rest"])
    params["encoder"] = unstack_layer_params(pp["layers"], n_layers)
    return params


def _pipeline_forward_split(
    cfg: ModelConfig,
    mesh: Mesh,
    n_microbatches: int,
    stacked,
    rest,
    visual: Array,
    audio: Array,
    text: Array,
    mask: Array,
    deterministic: bool = True,
    rng=None,
    seg_ids: Array | None = None,
    positions: Array | None = None,
) -> MMCTOutput:
    if not deterministic and rng is None:
        raise ValueError("deterministic=False needs a dropout rng")
    validate_pipeline(cfg, mesh, n_microbatches, visual.shape[0])
    x = _embed(cfg, rest, visual, audio, text, positions)
    x = _pipeline_encoder(
        cfg, mesh, n_microbatches, stacked, x, mask, seg_ids, rng, deterministic
    )
    return _head(cfg, rest, x, deterministic, rng)


def pipeline_forward(
    cfg: ModelConfig,
    mesh: Mesh,
    n_microbatches: int,
    params,
    visual: Array,
    audio: Array,
    text: Array,
    mask: Array,
    deterministic: bool = True,
    rng=None,
    seg_ids: Array | None = None,
    positions: Array | None = None,
) -> MMCTOutput:
    """Full MMCT forward with the encoder pipelined over the pipe axis.
    Value-identical to ``MMCT.apply`` when deterministic (pinned by
    tests/test_pipeline.py); with dropout the draws differ (module docstring).
    Takes the STANDARD per-layer tree (replicated; convenient for checkpoints
    and the Trainer) — deep models that need per-stage parameter memory use
    the split layout via ``create_pipeline_train_state``."""
    split = split_pipeline_params(params, cfg.self_num_layers)
    return _pipeline_forward_split(
        cfg, mesh, n_microbatches, split["layers"], split["rest"],
        visual, audio, text, mask, deterministic, rng, seg_ids, positions,
    )


class PipelinedMMCT:
    """Duck-types the slice of the Flax model API the train/eval steps use
    (``.apply``) so ``make_train_step(model=...)`` / ``make_eval_step`` run
    the pipelined forward with the rest of the step — loss, Adam, telemetry —
    unchanged (train/step.py)."""

    def __init__(self, cfg: ModelConfig, mesh: Mesh, n_microbatches: int):
        self.cfg = cfg
        self.mesh = mesh
        self.n_microbatches = n_microbatches

    def apply(
        self,
        variables,
        visual,
        audio,
        text,
        mask,
        deterministic: bool = True,
        seg_ids=None,
        positions=None,
        rngs=None,
    ) -> MMCTOutput:
        rng = (rngs or {}).get("dropout")
        return pipeline_forward(
            self.cfg,
            self.mesh,
            self.n_microbatches,
            variables["params"],
            visual,
            audio,
            text,
            mask,
            deterministic,
            rng,
            seg_ids,
            positions,
        )


class PipelinedMMCTStacked:
    """Like ``PipelinedMMCT`` but over the SPLIT param layout
    (``{"layers": [L, ...] pipe-sharded, "rest": replicated}``) — the
    memory-honest state where each stage's HBM holds only its own layers.
    Build the matching TrainState with ``create_pipeline_train_state``."""

    def __init__(self, cfg: ModelConfig, mesh: Mesh, n_microbatches: int):
        self.cfg = cfg
        self.mesh = mesh
        self.n_microbatches = n_microbatches

    def apply(
        self,
        variables,
        visual,
        audio,
        text,
        mask,
        deterministic: bool = True,
        seg_ids=None,
        positions=None,
        rngs=None,
    ) -> MMCTOutput:
        rng = (rngs or {}).get("dropout")
        pp = variables["params"]
        return _pipeline_forward_split(
            self.cfg,
            self.mesh,
            self.n_microbatches,
            pp["layers"],
            pp["rest"],
            visual,
            audio,
            text,
            mask,
            deterministic,
            rng,
            seg_ids,
            positions,
        )


def create_pipeline_train_state(
    model_cfg: ModelConfig,
    train_cfg,
    mesh: Mesh,
    steps_per_epoch: int,
    rng,
):
    """Memory-honest pipeline TrainState: params in the split layout with the
    layer stack placed ``P("pipe")`` — each stage's devices hold ONLY their
    own L/S layers (and the small replicated rest), and Adam moments inherit
    the same placement. Returns ``(state, tx, schedule)``; pair with
    ``make_train_step(model=PipelinedMMCTStacked(...))``. Export a standard
    tree for checkpoints/decode with ``merge_pipeline_params``. At the
    flagship's 85M params replication costs ~0.6 GB and the plain
    ``PipelinedMMCT`` path is simpler; this layout is for much deeper
    variants where per-stage parameter memory matters."""
    from jax.sharding import NamedSharding

    from repurpose_tpu.train.state import TrainState, create_train_state

    state, tx, schedule = create_train_state(
        model_cfg, train_cfg, steps_per_epoch, rng
    )
    split = split_pipeline_params(state.params, model_cfg.self_num_layers)
    lay_specs = stacked_param_specs(split["layers"])
    rep = NamedSharding(mesh, P())
    placed = {
        # pipe on dim 0; under pipe x tp the Megatron dims also land on the
        # model axis (stacked_param_specs) so Adam moments inherit both.
        "layers": jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            split["layers"],
            lay_specs,
        ),
        "rest": jax.tree.map(lambda x: jax.device_put(x, rep), split["rest"]),
    }
    opt_state = tx.init(placed)  # zeros_like inherits the placement
    return TrainState(params=placed, opt_state=opt_state, step=state.step), tx, schedule


__all__ = [
    "PipelinedMMCT",
    "PipelinedMMCTStacked",
    "create_pipeline_train_state",
    "merge_pipeline_params",
    "pipeline_forward",
    "split_pipeline_params",
    "stack_layer_params",
    "unstack_layer_params",
    "validate_pipeline",
]
