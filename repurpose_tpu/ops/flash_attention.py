"""Pallas fused masked attention for TPU.

The reference's hot spot is 16 layers of dense O(T^2) attention over padded
per-second sequences (models/MMCTransformer.py:135-138, T up to 1800). XLA's
stock path materializes [B, H, T, T] score tensors in HBM; these kernels keep
everything in VMEM:

- **forward**: FLAT layout — grid (B, D/Dblk, T/Tq) over [B, T, D] with a
  static in-kernel loop over the Dblk/dh head slices, so there are no
  [B,T,H,Dh]<->[B,H,T,Dh] transposes around the kernel (the [B,T,H,Dh] ->
  [B,T,D] reshape merges contiguous axes — free). Each program owns one query
  block; the K/V slabs for its head group sit in VMEM. Also emits the per-row
  logsumexp (LSE) for the backward. Measured 2.75x XLA's fused attention and
  6% over the transposed-layout flash kernel at T=2048 on v5e
  (tools/bench_attention_fwd.py).
- **long T (> STREAM_MAX_T): k-blocked streaming interior.** The single-slab
  kernels hold a [Tq, T] float32 score buffer in VMEM, which stops fitting
  past T~2-4k. The ``*_stream`` kernel variants keep the same grid, layout,
  and VMEM-resident K/V slabs but tile the score axis: the forward runs the
  canonical online-softmax recurrence over k-blocks (running max/denominator,
  rescaled accumulator), dq streams k-blocks re-normalizing via the saved
  LSE, and dk/dv streams q-chunks. Score VMEM becomes O(Tq * k_block)
  regardless of T; the remaining T-scaling is the K/V (forward/dq) slabs at
  ~T*128*2 bytes each, which caps the slab strategy at T~8k (18 MB f32 at
  T=8192 already trips the 16 MB scoped-vmem limit, measured).
- **arbitrary T (> HBM_STREAM_T): HBM-resident K/V.** The ``*_hbm`` forward
  and dq variants never bring K/V into VMEM whole: they take them as ANY
  (HBM) refs and double-buffer [k_block, Dblk] chunks in VMEM scratch via
  explicit ``make_async_copy`` DMA, starting chunk kb+1's copy before
  computing chunk kb. Per-head online-softmax/accumulator state is carried
  stacked so the k sweep is outer and every chunk is fetched exactly once.
  The 4-axis streaming dk/dv kernel is already T-bounded (blockspec-driven
  chunk fetch). VMEM is then fully T-independent: measured to T=65536
  kernel-level and T=32768 full-model fwd+train on v5e (the reference caps
  at 5000; 32768 = a 9-hour video at 1 feature/s). Bit-exact vs the slab
  streaming kernels at T=8192 bf16 (same math, same block size).
  Selection is automatic in ``mha_pallas``; all
  paths produce identical math (same fp32 softmax, tests compare exactly).
- **backward**: the canonical two-kernel FlashAttention split —
  a dq kernel gridded over q blocks (row softmax recomputed from full K/V)
  and a dk/dv kernel gridded over K blocks (columns normalized via the saved
  LSE; each k-block's gradients complete in one grid step, no accumulation).
  Both kernels use the same FLAT [B, T, D] layout as the forward, so the
  backward pays zero transposes (the old [B,H,T,Dh] layout cost 8 HBM
  round-trip transposes per layer: 5 in, 3 out). Measured 8% faster per
  attention grad (2.92 vs 3.17 ms fwd+bwd at [8,2048,8,64], chained
  on-device, same process — tools/bench_attention_bwd.py) and 2.36x the
  XLA-recompute backward. A SINGLE-pass fused backward (dq + dk/dv
  accumulated in VMEM scratch over a sequential q sweep, one score recompute,
  LSE-based softmax) was built and measured ~20% SLOWER (3.45 vs 2.88
  ms/grad, best q_block) — the read-modify-write accumulators and the lost
  inter-kernel pipelining cost more than the second score recompute saves on
  v5e at these shapes; the two-kernel split stands.
- scores and softmax in float32 on the MXU/VPU, inputs/outputs in the
  activation dtype (bfloat16 in production);
- key-padding mask applied as a -1e9 additive bias (torch
  src_key_padding_mask semantics; fully-padded query rows stay finite).

``backward="pallas"`` (the default, used by attention_impl="auto"/
"pallas_full") runs the fused two-kernel backward — measured 1.57x the
XLA-recompute backward for the flagship train step at T=2048 on v5e
(133.8 vs 210.3 ms/step, chained back-to-back in one process).
``backward="xla"`` (attention_impl="pallas") recomputes through the XLA
einsum path instead. Non-TPU backends run the same kernels in interpret
mode, so CPU tests exercise identical code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from repurpose_tpu.ops.attention import NEG_INF, mha_xla

Array = jax.Array

DEFAULT_Q_BLOCK = 512  # measured best at T=2048 on v5e (tools/bench_attention_fwd.py)
DEFAULT_K_BLOCK = 256

# Beyond this sequence length the [Tq, T] f32 score slab (q_block * T * 4
# bytes, 2 live copies) outgrows VMEM and the streaming (k-blocked) kernel
# interiors take over. At the default q_block=512, T=2048 keeps scores at
# 4 MB; T=4096 would need 8 MB x2 plus slabs — streaming wins there.
STREAM_MAX_T = 2048
STREAM_K_BLOCK = 1024  # score tile [q_block, STREAM_K_BLOCK] along the key axis

# Beyond this, even the K/V SLABS ([T, d_block] bf16, two of them — 8 MB each
# at T=8192/d=512) outgrow VMEM, and the *_hbm kernel variants take over:
# K/V stay in HBM (memory_space=ANY) and the kernel double-buffers
# [k_block, d_block] chunks in VMEM scratch via explicit async DMA, overlapped
# with the online-softmax compute. VMEM then no longer scales with T at all —
# single-chip attention extends to arbitrary sequence length (multi-hour
# video: 8 h at 1 feature/s = 28.8k steps; the reference caps at 5000).
HBM_STREAM_T = 8192

# Per-kernel overrides of STREAM_MAX_T for the two backward kernels (None =
# use STREAM_MAX_T). The dense and streaming interiors skip padding on
# opposite axes (dense dq skips padded q blocks but sweeps full-T keys;
# streaming dq also bounds its k sweep at kvl — and mirrored for dk/dv), so
# the best choice per kernel depends on fill and was swept independently
# (tools/bench_prefix_skip.py).
DQ_STREAM_T: int | None = None
DKV_STREAM_T: int | None = None

# Sequence-packed STREAMING threshold: above this T the packed forward
# switches from the dense [Tq, T] slab to the k-blocked BOUNDED sweep — each
# query block's key loop runs only the blocks overlapping its own videos'
# spans (block-diagonal attention makes everything outside exactly zero
# mass), so per-video key cost stays ~the video's own length even inside a
# long packed row. None = STREAM_MAX_T (dense in the corpus-bucket window,
# streaming beyond — mirroring the unpacked routing); a smaller value forces
# the streaming interior earlier for sweeps. Forcing it at T=2048 MEASURED
# SLOWER than the dense slab on v5e (34.8 vs 26.5 ms,
# tools/bench_packed_infer.py): the per-block online-softmax rescale costs
# the VPU more than the skipped blocks save — but past STREAM_MAX_T the
# dense slab stops fitting VMEM and the bounded sweep is the only packed
# interior. The packed BACKWARD mirrors this routing (bounded-sweep dq,
# overlap-gated 4-axis dkv, HBM-resident dq past HBM_STREAM_T), so
# pack_sequences composes with long-video buckets end-to-end
# (tests/test_flash_attention.py packed long-T parity tests).
PACKED_STREAM_T: int | None = None
PACKED_K_BLOCK = 512

# Packed DENSE kernel blocks. The seg-equality bias is a full [Tq, T] VPU
# build PER d-BLOCK PROGRAM, so the packed kernel wants larger d blocks
# (more heads sharing one build) than the unpacked default
# (_pick_d_block = 128 at flagship dims): measured on v5e at corpus-fill
# packing (tools/bench_packed_infer.py, back-to-back): d_block 256 +
# q_block 512 gives 26.45 ms/batch (529 videos/s) vs 28.16 (497) at the
# unpacked defaults; q_block 256/128 at d_block 256 lose (27.0/28.8).
# Applied only when it legally tiles (divides d, whole heads);
# PACKED_Q_BLOCK is the packed default query block (callers can still pass
# q_block explicitly).
PACKED_D_BLOCK = 256
PACKED_Q_BLOCK = 512
# Backward counterpart of PACKED_D_BLOCK (None = keep _pick_d_block).
# Measured on v5e packed train step (tools/bench_packed_train.py):
# bwd_db=256 fails to compile (the dq/dkv kernels carry k/v/o/g slabs plus
# two [Tq, T] f32 interiors per program — the compile helper dies where the
# forward at 256 still fit), so None (d_block 128) is the measured default:
# 87.2 ms/step, 11 videos at 93% fill = 126 videos/s vs 74.9 ms/6 = 80
# unpacked (1.57x).
PACKED_BWD_D_BLOCK: int | None = None

# HBM-regime (t > HBM_STREAM_T) block overrides, swept on v5e at
# [1, 32768, 8, 64] (tools/bench_hbm_sweep.py, back-to-back one process;
# 2026-08-19). None = the shorter-regime default. Applied only when they
# tile legally; the t <= HBM_STREAM_T regimes keep their own tuned blocks.
# - forward DMA chunk 2048: 36.24 ms vs 38.30 at the 1024 default (-5%);
#   larger chunks amortize DMA issue over more MXU work.
# - dkv key block 512 + backward d_block 256: 255.4 ms grad vs 317.5 at
#   the (256, None=128) defaults (-20%) — the 4-axis dkv kernel's f32
#   scratch accumulators revisit [k_block, d_block] tiles across the whole
#   q sweep, so bigger tiles quarter the revisit count; 2048/512-d combos
#   exceed scoped VMEM (compile OOM), these are the largest legal ones.
HBM_FWD_K_BLOCK = 2048
HBM_FWD_D_BLOCK: int | None = None
HBM_DKV_K_BLOCK = 512
HBM_BWD_D_BLOCK: int | None = 256

# Mosaic grid-axis semantics for the three 3-axis kernels' (batch, d-block,
# t-block) grids. Every program is independent (no cross-step accumulation),
# so all axes are legal as "parallel". Swept on v5e (tools/bench_dimsem.py,
# back-to-back one process): default 2.343/5.636 ms fwd/grad at
# [8,2048,8,64], all-parallel 2.325/5.588, parallel+arbitrary 2.295/5.594 —
# ~1-2%, never worse; ship the best. (The 4-axis streaming dkv grid keeps
# compiler defaults: its q-axis accumulates in scratch.)
GRID_SEMANTICS: tuple[str, str, str] | None = ("parallel", "parallel", "arbitrary")

# LSE value written for skipped (fully-padded) query blocks: large enough
# that the backward's exp(s - lse) underflows to exactly 0 for any real
# score, small enough to stay finite in f32 arithmetic.
SKIP_LSE = 1e30


def _cp_kwargs() -> dict:
    """compiler_params kwargs for the 3-axis pallas_calls ({} when
    GRID_SEMANTICS is None — read at trace time so benches can sweep it)."""
    if GRID_SEMANTICS is None:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            dimension_semantics=GRID_SEMANTICS
        )
    }


def _kv_len(key_valid: Array) -> Array:
    """[B, 1] int32: last valid key index + 1 per batch row (0 if none) — the
    exact prefix bound for block skipping under ARBITRARY masks: blocks past
    it contain only masked keys (whose softmax weight underflows to exactly 0
    under the -1e9 bias), so dropping them is a no-op numerically; interior
    holes are still handled by the bias. Rank 2 because Mosaic rejects rank-1
    SMEM blocks smaller than the array (tiling-size rule)."""
    t = key_valid.shape[1]
    idx = jnp.arange(t, dtype=jnp.int32)[None, :]
    kvl = (jnp.max(jnp.where(key_valid, idx, -1), axis=1) + 1).astype(jnp.int32)
    return kvl[:, None]


def _pick_block(t: int, preferred: int) -> int | None:
    """Largest block <= preferred that divides t (None if t has no usable
    power-of-two-ish divisor — caller falls back to the XLA path)."""
    for b in (preferred, 512, 256, 128, 64, 32, 16, 8):
        if b <= preferred and t % b == 0:
            return b
    return None


def _pick_d_block(d: int, dh: int) -> int:
    """Feature-axis block for the flat forward: the smallest multiple of dh
    that is lane-aligned (128) and divides d; else the full axis (always a
    legal Mosaic block)."""
    from math import gcd

    l = dh * 128 // gcd(dh, 128)
    return l if d % l == 0 else d


# -- forward ---------------------------------------------------------------------


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, kvl_ref, *rest,
    scale: float, heads: int, sm_dtype=jnp.float32, packed: bool = False,
):
    # packed=True (sequence packing): two extra int32 seg refs — seg_col
    # [1, Tq, 1] for this q block's rows, seg_row [1, 1, T] for the keys —
    # and the [1, T] key bias becomes a block-diagonal [Tq, T] bias
    # (query attends key only within its own segment). Built ONCE per
    # program and reused across the head loop, so the extra VPU cost
    # amortizes to ~1/heads of one [Tq, T] pass.
    if packed:
        seg_col_ref, seg_row_ref, o_ref, lse_ref = rest
    else:
        o_ref, lse_ref = rest
    # FLAT layout (no transposes): q_ref [1, Tq, Dblk]; k/v [1, T, Dblk];
    # mask [1, 1, T]; lse [1, heads, Tq, 1]. Dblk packs `heads` head slices;
    # the loop is static (Dblk/dh <= a few heads — _pick_d_block), so Mosaic
    # keeps one live score buffer per iteration.
    # The kernel is VPU-bound (the MXU finishes its two dh=64 dots long before
    # the VPU finishes the [Tq, T] softmax passes), so every elementwise pass
    # over [Tq, T] counts: the scale folds into q ([Tq, Dh] — one dot input),
    # and the softmax divide is DEFERRED past the PV matmul so it lands on
    # [Tq, Dh] instead of [Tq, T] ((e @ v) / denom == (e / denom) @ v).
    # ``sm_dtype=bfloat16`` stores the [Tq, T] softmax interior in bf16
    # (scores still accumulate f32 on the MXU; denominator sum and LSE are
    # f32). Measured ~3% on the full model fwd at T=2048 on v5e (28.19 ->
    # 27.22 ms/batch, tools/bench_r3_campaign.py) — the VPU's ALU rate is
    # dtype-independent, so the win is only halved buffer traffic, not the
    # hoped-for 2x. Kept as the production default (accuracy-gated ~1e-3).
    # Prefix skipping: kvl_ref[0] is (last valid key index + 1) for this batch
    # row. Query blocks entirely past it are padding — write zeros and a huge
    # LSE (so the backward's exp(s - lse) underflows to exactly 0 instead of
    # overflowing on garbage scores) and skip all compute. Real corpora fill
    # ~60% of a bucket, so this removes a large share of the T^2 work.
    d = q_ref.shape[-1]
    dh = d // heads
    kvl = kvl_ref[pl.program_id(0), 0]
    q_start = pl.program_id(2) * q_ref.shape[1]

    @pl.when(q_start >= kvl)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
        lse_ref[...] = jnp.full_like(lse_ref, SKIP_LSE)

    @pl.when(q_start < kvl)
    def _():
        ok = mask_ref[0] != 0  # [1, T]
        if packed:
            ok = ok & (seg_col_ref[0] == seg_row_ref[0])  # [Tq, T]
        bias = jnp.where(ok, 0.0, NEG_INF)
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            q = (q_ref[0, :, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
            s = jax.lax.dot_general(
                q, k_ref[0, :, sl], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = (s + bias).astype(sm_dtype)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            o = jax.lax.dot_general(
                e.astype(v_ref.dtype), v_ref[0, :, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, sl] = (o / denom).astype(o_ref.dtype)
            lse_ref[0, h] = m.astype(jnp.float32) + jnp.log(denom)  # [Tq, 1]


def _flash_forward(
    q: Array, k: Array, v: Array, key_valid: Array, q_block: int, interpret: bool,
    sm_dtype=jnp.float32, seg_ids: Array | None = None,
) -> tuple[Array, Array]:
    """q/k/v: [B, T, H, Dh] -> (out [B, T, H, Dh], lse [B, H, T, 1]).

    Runs in the native [B, T, H*Dh] layout (the reshape is free — it merges
    contiguous trailing axes), so unlike the canonical [B, H, T, Dh] flash
    layout there are NO transposes around the kernel: measured 6% faster
    end-to-end at [8, 2048, 8, 64] on v5e (tools/bench_attention_fwd.py)."""
    b, t, h, dh = q.shape
    d = h * dh
    q_block = min(q_block, t)
    scale = 1.0 / (dh ** 0.5)
    d_block = _pick_d_block(d, dh)
    if t > HBM_STREAM_T and HBM_FWD_D_BLOCK is not None:
        hdb = min(HBM_FWD_D_BLOCK, d)
        if d % hdb == 0 and hdb % dh == 0:
            d_block = hdb
    if seg_ids is not None and t <= STREAM_MAX_T:
        # packed dense kernels rebuild the [Tq, T] seg bias once per d-block
        # program — larger d blocks amortize it over more heads (measured,
        # see PACKED_D_BLOCK) when they tile legally. NOT applied to the
        # long-T slab kernels: doubling d_block doubles the VMEM-resident
        # K/V slabs, which already cap the slab strategy at T~8k.
        pdb = min(PACKED_D_BLOCK, d)
        if d % pdb == 0 and pdb % dh == 0:
            d_block = max(d_block, pdb)
    heads_per_block = d_block // dh

    qf = q.reshape(b, t, d)
    kf = k.reshape(b, t, d)
    vf = v.reshape(b, t, d)
    mask = key_valid[:, None, :].astype(jnp.int32)  # [B, 1, T]
    kvl = _kv_len(key_valid)

    blk_q = pl.BlockSpec(
        (1, q_block, d_block), lambda bi, di, i: (bi, i, di), memory_space=pltpu.VMEM
    )
    blk_kv = pl.BlockSpec(
        (1, t, d_block), lambda bi, di, i: (bi, 0, di), memory_space=pltpu.VMEM
    )
    blk_mask = pl.BlockSpec(
        (1, 1, t), lambda bi, di, i: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    blk_kvl = pl.BlockSpec(
        (b, 1), lambda bi, di, i: (0, 0), memory_space=pltpu.SMEM
    )
    blk_lse = pl.BlockSpec(
        (1, heads_per_block, q_block, 1), lambda bi, di, i: (bi, di, i, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = (
        jax.ShapeDtypeStruct((b, t, d), q.dtype),
        jax.ShapeDtypeStruct((b, h, t, 1), jnp.float32),
    )
    if t > HBM_STREAM_T:
        kb = _pick_block(t, HBM_FWD_K_BLOCK)
        packed_ins, packed_ops = [], []
        if seg_ids is not None:
            # sequence packing at arbitrary T: seg bias + bounded k sweep
            nqb = t // q_block
            lo, hi = _packed_block_bounds(seg_ids, q_block, kb)
            packed_ins = [
                pl.BlockSpec((1, q_block, 1), lambda bi, di, i: (bi, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t), lambda bi, di, i: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, nqb), lambda bi, di, i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((b, nqb), lambda bi, di, i: (0, 0),
                             memory_space=pltpu.SMEM),
            ]
            packed_ops = [
                seg_ids[:, :, None].astype(jnp.int32),
                seg_ids[:, None, :].astype(jnp.int32),
                lo, hi,
            ]
        out, lse = pl.pallas_call(
            functools.partial(
                _flash_fwd_hbm_kernel, scale=scale, heads=heads_per_block,
                k_block=kb, d_block=d_block, sm_dtype=sm_dtype,
                packed=seg_ids is not None,
            ),
            grid=(b, d // d_block, t // q_block),
            in_specs=[
                blk_q,
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                blk_mask, blk_kvl, *packed_ins,
            ],
            out_specs=(blk_q, blk_lse),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((2, kb, d_block), k.dtype),
                pltpu.VMEM((2, kb, d_block), v.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interpret,
            **_cp_kwargs(),
        )(qf, kf, vf, mask, kvl, *packed_ops)
        return out.reshape(b, t, h, dh), lse
    # packed long-T (STREAM_MAX_T < t <= HBM_STREAM_T): the bounded-sweep
    # streaming kernel is the only VMEM-legal packed interior (the dense
    # packed kernel's [Tq, T] slab stops fitting). PACKED_STREAM_T can force
    # it earlier for sweeps (measured slower than dense at t=2048).
    packed_kb = (
        _pick_block(t, min(PACKED_K_BLOCK, t))
        if seg_ids is not None
        and t > (PACKED_STREAM_T if PACKED_STREAM_T is not None else STREAM_MAX_T)
        else None
    )
    if packed_kb is not None:
        # packed streaming: bounded k sweep per query block (see
        # _flash_fwd_packed_stream_kernel). Packed rows are ~full, so the
        # dense kernel's prefix skipping has nothing to skip; bounding the
        # key loop to each block's own videos recovers the block-diagonal
        # sparsity instead.
        kb = packed_kb
        lo, hi = _packed_block_bounds(seg_ids, q_block, kb)
        nqb = t // q_block
        out, lse = pl.pallas_call(
            functools.partial(
                _flash_fwd_packed_stream_kernel, scale=scale,
                heads=heads_per_block, k_block=kb, sm_dtype=sm_dtype,
            ),
            grid=(b, d // d_block, nqb),
            in_specs=[blk_q, blk_kv, blk_kv, blk_mask, blk_kvl,
                      pl.BlockSpec((1, q_block, 1), lambda bi, di, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1, t), lambda bi, di, i: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((b, nqb), lambda bi, di, i: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((b, nqb), lambda bi, di, i: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=(blk_q, blk_lse),
            out_shape=out_shape,
            interpret=interpret,
            **_cp_kwargs(),
        )(qf, kf, vf, mask, kvl,
          seg_ids[:, :, None].astype(jnp.int32),
          seg_ids[:, None, :].astype(jnp.int32),
          lo, hi)
        return out.reshape(b, t, h, dh), lse
    if seg_ids is not None:
        # sequence packing: dense kernel only (mha_pallas guarantees
        # t <= STREAM_MAX_T on this path; long rows hold one video anyway)
        out, lse = pl.pallas_call(
            functools.partial(
                _flash_fwd_kernel, scale=scale, heads=heads_per_block,
                sm_dtype=sm_dtype, packed=True,
            ),
            grid=(b, d // d_block, t // q_block),
            in_specs=[blk_q, blk_kv, blk_kv, blk_mask, blk_kvl,
                      pl.BlockSpec((1, q_block, 1), lambda bi, di, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1, t), lambda bi, di, i: (bi, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(blk_q, blk_lse),
            out_shape=out_shape,
            interpret=interpret,
            **_cp_kwargs(),
        )(qf, kf, vf, mask, kvl,
          seg_ids[:, :, None].astype(jnp.int32),
          seg_ids[:, None, :].astype(jnp.int32))
        return out.reshape(b, t, h, dh), lse
    if t > STREAM_MAX_T:
        kernel = functools.partial(
            _flash_fwd_stream_kernel, scale=scale, heads=heads_per_block,
            k_block=_pick_block(t, STREAM_K_BLOCK), sm_dtype=sm_dtype,
        )
    else:
        kernel = functools.partial(
            _flash_fwd_kernel, scale=scale, heads=heads_per_block,
            sm_dtype=sm_dtype,
        )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, d // d_block, t // q_block),
        in_specs=[blk_q, blk_kv, blk_kv, blk_mask, blk_kvl],
        out_specs=(blk_q, blk_lse),
        out_shape=out_shape,
        interpret=interpret,
        **_cp_kwargs(),
    )(qf, kf, vf, mask, kvl)
    return out.reshape(b, t, h, dh), lse


def _packed_block_bounds(
    seg_ids: Array, q_block: int, k_block: int
) -> tuple[Array, Array]:
    """Per-(batch row, query block) key-block bounds [lo, hi) for the packed
    streaming kernel: the smallest contiguous k-block range covering every
    video that owns a row of the query block. Videos lie head-to-tail
    (data/batching.py:pack_batch), so each position's video span is
    [start_of, end_of) with start_of = cummax over video starts and end_of =
    reverse-cummin over video ends; blocks outside the range hold only keys
    of OTHER videos (or padding), whose block-diagonal softmax mass is
    exactly zero — skipping them is a numeric no-op."""
    b, t = seg_ids.shape
    t_idx = jnp.arange(t, dtype=jnp.int32)[None]
    valid = seg_ids >= 0
    prev = jnp.pad(seg_ids[:, :-1], ((0, 0), (1, 0)), constant_values=-2)
    is_start = valid & (seg_ids != prev)
    start_of = jax.lax.cummax(jnp.where(is_start, t_idx, 0), axis=1)
    nxt = jnp.pad(seg_ids[:, 1:], ((0, 0), (0, 1)), constant_values=-2)
    is_end = valid & (seg_ids != nxt)
    end_of = jax.lax.cummin(jnp.where(is_end, t_idx + 1, t), axis=1, reverse=True)
    nqb = t // q_block
    lo = jnp.where(valid, start_of, t).reshape(b, nqb, q_block).min(-1) // k_block
    hi = -(-jnp.where(valid, end_of, 0).reshape(b, nqb, q_block).max(-1) // k_block)
    return lo.astype(jnp.int32), jnp.maximum(hi, lo).astype(jnp.int32)


def _flash_fwd_packed_stream_kernel(
    q_ref, k_ref, v_ref, mask_ref, kvl_ref, seg_col_ref, seg_row_ref,
    lo_ref, hi_ref, o_ref, lse_ref,
    *, scale: float, heads: int, k_block: int, sm_dtype=jnp.float32,
):
    # Sequence-packed streaming forward: block-diagonal attention with a
    # BOUNDED k sweep. Same flat layout and online-softmax recurrence as
    # _flash_fwd_stream_kernel, plus the two seg refs of the dense packed
    # kernel; lo/hi ([B, nqb] SMEM, from _packed_block_bounds) restrict each
    # query block's key loop to the k blocks its own videos occupy. The block
    # loop is OUTER and per-head state is carried as a tuple, so the seg bias
    # for a key block is built once and shared across the head loop.
    d = q_ref.shape[-1]
    dh = d // heads
    tq = q_ref.shape[1]
    bi = pl.program_id(0)
    qi = pl.program_id(2)
    kvl = kvl_ref[bi, 0]
    q_start = qi * tq

    @pl.when(q_start >= kvl)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
        lse_ref[...] = jnp.full_like(lse_ref, SKIP_LSE)

    @pl.when(q_start < kvl)
    def _():
        seg_col = seg_col_ref[0]  # [Tq, 1]
        qh = [
            (q_ref[0, :, h * dh : (h + 1) * dh].astype(jnp.float32) * scale)
            .astype(q_ref.dtype)
            for h in range(heads)
        ]

        def body(kb, carry):
            ks = pl.ds(kb * k_block, k_block)
            ok = (mask_ref[0, :, ks] != 0) & (seg_col == seg_row_ref[0, :, ks])
            bias = jnp.where(ok, 0.0, NEG_INF)  # [Tq, k_block]
            kslab = k_ref[0, ks, :]
            vslab = v_ref[0, ks, :]
            out = []
            for h in range(heads):
                m, l, acc = carry[h]
                sl = slice(h * dh, (h + 1) * dh)
                s = (jax.lax.dot_general(
                    qh[h], kslab[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bias).astype(sm_dtype)
                m_new = jnp.maximum(
                    m, jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32)
                )
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new.astype(sm_dtype))
                l_new = l * alpha + jnp.sum(
                    p, axis=-1, keepdims=True, dtype=jnp.float32
                )
                pv = jax.lax.dot_general(
                    p.astype(vslab.dtype), vslab[:, sl],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                out.append((m_new, l_new, acc * alpha + pv))
            return tuple(out)

        init = tuple(
            (
                jnp.full((tq, 1), -1e30, jnp.float32),
                jnp.zeros((tq, 1), jnp.float32),
                jnp.zeros((tq, dh), jnp.float32),
            )
            for _ in range(heads)
        )
        carry = jax.lax.fori_loop(lo_ref[bi, qi], hi_ref[bi, qi], body, init)
        for h in range(heads):
            m, l, acc = carry[h]
            o_ref[0, :, h * dh : (h + 1) * dh] = (acc / l).astype(o_ref.dtype)
            lse_ref[0, h] = m + jnp.log(l)


def _flash_fwd_stream_kernel(
    q_ref, k_ref, v_ref, mask_ref, kvl_ref, o_ref, lse_ref,
    *, scale: float, heads: int, k_block: int, sm_dtype=jnp.float32,
):
    # Streaming (long-T) forward: same FLAT layout and refs as
    # _flash_fwd_kernel, but the [Tq, T] score slab is tiled into
    # [Tq, k_block] chunks with the online-softmax recurrence, so VMEM no
    # longer scales with T (only the K/V slabs do). fori_loop keeps code size
    # flat as T grows (T=16k would unroll 16 blocks per head otherwise).
    # Prefix skipping (see _flash_fwd_kernel): padded query blocks skip
    # entirely, and the k sweep runs only ceil(kvl / k_block) blocks — keys
    # past the last valid one are exact zeros in the softmax (their bias
    # drives exp to f32 underflow), so dropping them changes nothing.
    d = q_ref.shape[-1]
    dh = d // heads
    tq = q_ref.shape[1]
    kvl = kvl_ref[pl.program_id(0), 0]
    q_start = pl.program_id(2) * tq
    n_kb = pl.cdiv(kvl, k_block)

    @pl.when(q_start >= kvl)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
        lse_ref[...] = jnp.full_like(lse_ref, SKIP_LSE)

    @pl.when(q_start < kvl)
    def _():
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            q = (q_ref[0, :, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)

            def body(kb, carry):
                m, l, acc = carry
                ks = k_ref[0, pl.ds(kb * k_block, k_block), sl]
                vs = v_ref[0, pl.ds(kb * k_block, k_block), sl]
                bias = jnp.where(
                    mask_ref[0, :, pl.ds(kb * k_block, k_block)] != 0, 0.0, NEG_INF
                )  # [1, k_block]
                s = (jax.lax.dot_general(
                    q, ks, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bias).astype(sm_dtype)
                m_new = jnp.maximum(
                    m, jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32)
                )
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new.astype(sm_dtype))
                l = l * alpha + jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
                pv = jax.lax.dot_general(
                    p.astype(vs.dtype), vs,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return m_new, l, acc * alpha + pv

            # -1e30 (not -inf): fully-masked rows must stay finite (NEG_INF
            # bias keeps s ~ -1e9, so a real block always overwrites this max)
            m0 = jnp.full((tq, 1), -1e30, jnp.float32)
            l0 = jnp.zeros((tq, 1), jnp.float32)
            acc0 = jnp.zeros((tq, dh), jnp.float32)
            m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, acc0))
            o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)
            lse_ref[0, h] = m + jnp.log(l)


def _flash_fwd_hbm_kernel(
    q_ref, k_hbm, v_hbm, mask_ref, kvl_ref, *rest,
    scale: float, heads: int, k_block: int, d_block: int,
    sm_dtype=jnp.float32, packed: bool = False,
):
    # packed=True (sequence packing at arbitrary T): four extra refs —
    # seg_col [1, Tq, 1] / seg_row [1, 1, T] (block-diagonal bias, see
    # _flash_fwd_kernel) and lo/hi [B, nqb] SMEM (_packed_block_bounds) that
    # BOUND the k sweep to the chunks this query block's own videos occupy,
    # so per-video key DMA/compute cost stays ~the video's own length even
    # inside a multi-hour packed row.
    if packed:
        seg_col_ref, seg_row_ref, lo_ref, hi_ref, o_ref, lse_ref = rest[:6]
        kbuf, vbuf, sems = rest[6:]
    else:
        o_ref, lse_ref, kbuf, vbuf, sems = rest
    # Arbitrary-T forward: K/V never enter VMEM whole. They arrive as ANY
    # (HBM-resident) refs; the kernel DMAs [k_block, d_block] chunks into the
    # double-buffered kbuf/vbuf scratch (slot kb % 2), starting block kb+1's
    # copy before computing block kb so the DMA rides under the MXU work.
    # Per-head online-softmax state is carried STACKED ([heads, Tq, *]) so the
    # k sweep is the outer loop and each chunk is fetched exactly once.
    # Prefix skipping as in the slab kernels: the sweep stops at
    # ceil(kvl / k_block); fully-padded query blocks write zeros + SKIP_LSE.
    bi = pl.program_id(0)
    di = pl.program_id(1)
    qi = pl.program_id(2)
    dh = d_block // heads
    tq = q_ref.shape[1]
    kvl = kvl_ref[bi, 0]
    q_start = qi * tq
    n_kb = pl.cdiv(kvl, k_block)
    if packed:
        kb_lo = lo_ref[bi, qi]
        kb_hi = jnp.minimum(hi_ref[bi, qi], n_kb)
        live = (q_start < kvl) & (kb_lo < kb_hi)
    else:
        kb_lo, kb_hi = 0, n_kb
        live = q_start < kvl

    @pl.when(jnp.logical_not(live))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
        lse_ref[...] = jnp.full_like(lse_ref, SKIP_LSE)

    @pl.when(live)
    def _():
        def dmas(kb, slot):
            ks = pl.ds(kb * k_block, k_block)
            dsl = pl.ds(di * d_block, d_block)
            return (
                pltpu.make_async_copy(
                    k_hbm.at[bi, ks, dsl], kbuf.at[slot], sems.at[slot, 0]
                ),
                pltpu.make_async_copy(
                    v_hbm.at[bi, ks, dsl], vbuf.at[slot], sems.at[slot, 1]
                ),
            )

        for d0 in dmas(kb_lo, jax.lax.rem(kb_lo, 2) if packed else 0):
            d0.start()

        qh = [
            (q_ref[0, :, h * dh : (h + 1) * dh].astype(jnp.float32) * scale)
            .astype(q_ref.dtype)
            for h in range(heads)
        ]

        def body(kb, carry):
            m, l, acc = carry  # [heads, tq, 1] f32 x2, [heads, tq, dh] f32
            slot = jax.lax.rem(kb, 2)

            @pl.when(kb + 1 < kb_hi)
            def _():
                for dn in dmas(kb + 1, jax.lax.rem(kb + 1, 2)):
                    dn.start()

            for dc in dmas(kb, slot):
                dc.wait()
            kblk = kbuf[slot]  # [k_block, d_block]
            vblk = vbuf[slot]
            ok = mask_ref[0, :, pl.ds(kb * k_block, k_block)] != 0  # [1, k_block]
            if packed:
                ok = ok & (
                    seg_col_ref[0]
                    == seg_row_ref[0, :, pl.ds(kb * k_block, k_block)]
                )  # [Tq, k_block]
            bias = jnp.where(ok, 0.0, NEG_INF)
            ms, ls, accs = [], [], []
            for h in range(heads):
                sl = slice(h * dh, (h + 1) * dh)
                s = (jax.lax.dot_general(
                    qh[h], kblk[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bias).astype(sm_dtype)
                m_new = jnp.maximum(
                    m[h], jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32)
                )
                alpha = jnp.exp(m[h] - m_new)
                p = jnp.exp(s - m_new.astype(sm_dtype))
                ls.append(
                    l[h] * alpha
                    + jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
                )
                pv = jax.lax.dot_general(
                    p.astype(vblk.dtype), vblk[:, sl],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                accs.append(acc[h] * alpha + pv)
                ms.append(m_new)
            return jnp.stack(ms), jnp.stack(ls), jnp.stack(accs)

        m0 = jnp.full((heads, tq, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((heads, tq, 1), jnp.float32)
        acc0 = jnp.zeros((heads, tq, dh), jnp.float32)
        m, l, acc = jax.lax.fori_loop(kb_lo, kb_hi, body, (m0, l0, acc0))
        for h in range(heads):
            o_ref[0, :, h * dh : (h + 1) * dh] = (acc[h] / l[h]).astype(o_ref.dtype)
            lse_ref[0, h] = m[h] + jnp.log(l[h])


# -- backward: dq kernel (grid over q blocks) -------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, mask_ref, kvl_ref, *rest,
    scale: float, heads: int, sm_dtype=jnp.float32, packed: bool = False,
):
    # packed: extra seg_col [1, Tq, 1] / seg_row [1, 1, T] refs; the bias
    # becomes block-diagonal [Tq, T] (see _flash_fwd_kernel).
    if packed:
        seg_col_ref, seg_row_ref, o_ref, g_ref, lse_ref, dq_ref = rest
    else:
        o_ref, g_ref, lse_ref, dq_ref = rest
    # FLAT layout (see _flash_fwd_kernel): q/o/g/dq blocks [1, Tq, Dblk],
    # k/v slabs [1, T, Dblk], mask [1, 1, T], lse [1, heads, Tq, 1]; static
    # loop over head slices. VPU-pass economy: scale folds into q, and the
    # saved LSE replaces softmax recomputation — p = exp(s + bias - lse) is
    # ONE [Tq, T] pass where max-subtract + exp + denominator-sum were three
    # (measured 6% off the whole fwd+bwd grad at [8,2048,8,64] on v5e).
    # Prefix skipping: padded query rows have zero upstream gradient, so
    # their dq is exactly zero — whole blocks past kvl skip compute.
    d = q_ref.shape[-1]
    dh = d // heads
    kvl = kvl_ref[pl.program_id(0), 0]
    q_start = pl.program_id(2) * q_ref.shape[1]

    @pl.when(q_start >= kvl)
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    @pl.when(q_start < kvl)
    def _():
        ok = mask_ref[0] != 0  # [1, T]
        if packed:
            ok = ok & (seg_col_ref[0] == seg_row_ref[0])  # [Tq, T]
            # select form: a [Tq, T] f32 bias slab re-read by every head
            # pass costs 4x the traffic of the bool mask; masked positions
            # zero out AFTER the exp instead (exp may transiently hit inf
            # where a masked score exceeds lse — the select discards it).
            bias = None
        else:
            bias = jnp.where(ok, 0.0, NEG_INF)  # [1, T] row, broadcast-cheap
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            q = (q_ref[0, :, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
            k = k_ref[0, :, sl]
            v = v_ref[0, :, sl]
            g = g_ref[0, :, sl].astype(jnp.float32)
            o = o_ref[0, :, sl].astype(jnp.float32)
            lse = lse_ref[0, h]  # [Tq, 1]

            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # exact softmax rows via saved logsumexp; the [Tq, T] exp and ds
            # passes run in sm_dtype
            if packed:
                p = jnp.where(
                    ok, jnp.exp((s - lse).astype(sm_dtype)),
                    jnp.zeros((), sm_dtype),
                )
            else:
                p = jnp.exp((s + bias - lse).astype(sm_dtype))

            dp = jax.lax.dot_general(
                g, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dterm = jnp.sum(g * o, axis=-1, keepdims=True)
            ds = p * (dp - dterm).astype(sm_dtype)  # true ds up to the folded scale
            dq = jax.lax.dot_general(
                ds.astype(k.dtype), k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq_ref[0, :, sl] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dq_stream_kernel(
    q_ref, k_ref, v_ref, mask_ref, kvl_ref, o_ref, g_ref, lse_ref, dq_ref,
    *, scale: float, heads: int, k_block: int, sm_dtype=jnp.float32,
):
    # Streaming dq: k-blocked accumulation. No online softmax needed — the
    # saved LSE normalizes every block exactly (p = exp(s + bias - lse)).
    # Prefix skipping: padded query blocks write zero dq; the k sweep stops
    # at ceil(kvl / k_block) (keys past kvl carry exactly-zero softmax mass).
    d = q_ref.shape[-1]
    dh = d // heads
    tq = q_ref.shape[1]
    kvl = kvl_ref[pl.program_id(0), 0]
    q_start = pl.program_id(2) * tq
    n_kb = pl.cdiv(kvl, k_block)

    @pl.when(q_start >= kvl)
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    @pl.when(q_start < kvl)
    def _():
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            q = (q_ref[0, :, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
            g = g_ref[0, :, sl].astype(jnp.float32)
            o = o_ref[0, :, sl].astype(jnp.float32)
            lse = lse_ref[0, h]  # [Tq, 1]
            dterm = jnp.sum(g * o, axis=-1, keepdims=True)

            def body(kb, dq_acc):
                ks = k_ref[0, pl.ds(kb * k_block, k_block), sl]
                vs = v_ref[0, pl.ds(kb * k_block, k_block), sl]
                bias = jnp.where(
                    mask_ref[0, :, pl.ds(kb * k_block, k_block)] != 0, 0.0, NEG_INF
                )
                s = jax.lax.dot_general(
                    q, ks, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                p = jnp.exp((s + bias - lse).astype(sm_dtype))
                dp = jax.lax.dot_general(
                    g, vs, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ds = p * (dp - dterm).astype(sm_dtype)
                return dq_acc + jax.lax.dot_general(
                    ds.astype(ks.dtype), ks,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            dq = jax.lax.fori_loop(0, n_kb, body, jnp.zeros((tq, dh), jnp.float32))
            dq_ref[0, :, sl] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dq_packed_stream_kernel(
    q_ref, k_ref, v_ref, mask_ref, kvl_ref, seg_col_ref, seg_row_ref,
    lo_ref, hi_ref, o_ref, g_ref, lse_ref, dq_ref,
    *, scale: float, heads: int, k_block: int, sm_dtype=jnp.float32,
):
    # Sequence-packed streaming dq: _bwd_dq_stream_kernel plus the
    # block-diagonal seg bias, with the k sweep BOUNDED to [lo, hi) — the k
    # blocks this query block's own videos occupy (_packed_block_bounds).
    # Blocks outside carry exactly-zero softmax mass (the -1e9 seg bias
    # underflows in exp(s - lse)), so skipping them is a numeric no-op; the
    # seg bias still handles video boundaries INSIDE the range. The block
    # loop is outer (one bias build per block, shared across heads).
    d = q_ref.shape[-1]
    dh = d // heads
    tq = q_ref.shape[1]
    bi = pl.program_id(0)
    qi = pl.program_id(2)
    kvl = kvl_ref[bi, 0]
    q_start = qi * tq
    kb_lo = lo_ref[bi, qi]
    kb_hi = jnp.minimum(hi_ref[bi, qi], pl.cdiv(kvl, k_block))
    live = (q_start < kvl) & (kb_lo < kb_hi)

    @pl.when(jnp.logical_not(live))
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    @pl.when(live)
    def _():
        seg_col = seg_col_ref[0]  # [Tq, 1]
        qh, gh, dterm, lses = [], [], [], []
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            qh.append(
                (q_ref[0, :, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
            )
            gh.append(g_ref[0, :, sl].astype(jnp.float32))
            o = o_ref[0, :, sl].astype(jnp.float32)
            dterm.append(jnp.sum(gh[h] * o, axis=-1, keepdims=True))
            lses.append(lse_ref[0, h])  # [Tq, 1]

        def body(kb, dq_acc):  # [heads, tq, dh] f32
            ks = pl.ds(kb * k_block, k_block)
            ok = (mask_ref[0, :, ks] != 0) & (seg_col == seg_row_ref[0, :, ks])
            bias = jnp.where(ok, 0.0, NEG_INF)  # [Tq, k_block]
            kslab = k_ref[0, ks, :]
            vslab = v_ref[0, ks, :]
            outs = []
            for h in range(heads):
                sl = slice(h * dh, (h + 1) * dh)
                s = jax.lax.dot_general(
                    qh[h], kslab[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                p = jnp.exp((s + bias - lses[h]).astype(sm_dtype))
                dp = jax.lax.dot_general(
                    gh[h], vslab[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ds = p * (dp - dterm[h]).astype(sm_dtype)
                outs.append(dq_acc[h] + jax.lax.dot_general(
                    ds.astype(kslab.dtype), kslab[:, sl],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
            return jnp.stack(outs)

        dq = jax.lax.fori_loop(
            kb_lo, kb_hi, body, jnp.zeros((heads, tq, dh), jnp.float32)
        )
        for h in range(heads):
            dq_ref[0, :, h * dh : (h + 1) * dh] = (dq[h] * scale).astype(
                dq_ref.dtype
            )


def _bwd_dq_hbm_kernel(
    q_ref, k_hbm, v_hbm, mask_ref, kvl_ref, *rest,
    scale: float, heads: int, k_block: int, d_block: int,
    sm_dtype=jnp.float32, packed: bool = False,
):
    if packed:
        # seg bias + bounded k sweep, as in the packed _flash_fwd_hbm_kernel
        seg_col_ref, seg_row_ref, lo_ref, hi_ref = rest[:4]
        o_ref, g_ref, lse_ref, dq_ref, kbuf, vbuf, sems = rest[4:]
    else:
        o_ref, g_ref, lse_ref, dq_ref, kbuf, vbuf, sems = rest
    # Arbitrary-T dq: like _bwd_dq_stream_kernel but K/V stay in HBM and the
    # kernel double-buffers [k_block, d_block] chunks via async DMA (see
    # _flash_fwd_hbm_kernel). No online softmax — the saved LSE normalizes
    # every chunk exactly; dq accumulates STACKED per head ([heads, Tq, Dh])
    # so the k sweep is outer and each chunk is fetched once.
    bi = pl.program_id(0)
    di = pl.program_id(1)
    qi = pl.program_id(2)
    dh = d_block // heads
    tq = q_ref.shape[1]
    kvl = kvl_ref[bi, 0]
    q_start = qi * tq
    n_kb = pl.cdiv(kvl, k_block)
    if packed:
        kb_lo = lo_ref[bi, qi]
        kb_hi = jnp.minimum(hi_ref[bi, qi], n_kb)
        live = (q_start < kvl) & (kb_lo < kb_hi)
    else:
        kb_lo, kb_hi = 0, n_kb
        live = q_start < kvl

    @pl.when(jnp.logical_not(live))
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    @pl.when(live)
    def _():
        def dmas(kb, slot):
            ks = pl.ds(kb * k_block, k_block)
            dsl = pl.ds(di * d_block, d_block)
            return (
                pltpu.make_async_copy(
                    k_hbm.at[bi, ks, dsl], kbuf.at[slot], sems.at[slot, 0]
                ),
                pltpu.make_async_copy(
                    v_hbm.at[bi, ks, dsl], vbuf.at[slot], sems.at[slot, 1]
                ),
            )

        for d0 in dmas(kb_lo, jax.lax.rem(kb_lo, 2) if packed else 0):
            d0.start()

        qh, gh, dterm = [], [], []
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            qh.append(
                (q_ref[0, :, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
            )
            gh.append(g_ref[0, :, sl].astype(jnp.float32))
            o = o_ref[0, :, sl].astype(jnp.float32)
            dterm.append(jnp.sum(gh[h] * o, axis=-1, keepdims=True))

        def body(kb, dq_acc):  # [heads, tq, dh] f32
            slot = jax.lax.rem(kb, 2)

            @pl.when(kb + 1 < kb_hi)
            def _():
                for dn in dmas(kb + 1, jax.lax.rem(kb + 1, 2)):
                    dn.start()

            for dc in dmas(kb, slot):
                dc.wait()
            kblk = kbuf[slot]
            vblk = vbuf[slot]
            ok = mask_ref[0, :, pl.ds(kb * k_block, k_block)] != 0
            if packed:
                ok = ok & (
                    seg_col_ref[0]
                    == seg_row_ref[0, :, pl.ds(kb * k_block, k_block)]
                )
            bias = jnp.where(ok, 0.0, NEG_INF)
            outs = []
            for h in range(heads):
                sl = slice(h * dh, (h + 1) * dh)
                lse = lse_ref[0, h]  # [Tq, 1]
                s = jax.lax.dot_general(
                    qh[h], kblk[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                p = jnp.exp((s + bias - lse).astype(sm_dtype))
                dp = jax.lax.dot_general(
                    gh[h], vblk[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ds = p * (dp - dterm[h]).astype(sm_dtype)
                outs.append(dq_acc[h] + jax.lax.dot_general(
                    ds.astype(kblk.dtype), kblk[:, sl],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
            return jnp.stack(outs)

        dq = jax.lax.fori_loop(
            kb_lo, kb_hi, body, jnp.zeros((heads, tq, dh), jnp.float32)
        )
        for h in range(heads):
            dq_ref[0, :, h * dh : (h + 1) * dh] = (dq[h] * scale).astype(
                dq_ref.dtype
            )


# -- backward: dk/dv kernel (grid over k blocks, LSE-normalized columns) ----------


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, mask_ref, kvl_ref, *rest,
    scale: float, heads: int, sm_dtype=jnp.float32, packed: bool = False,
):
    # packed: extra seg_col [1, T, 1] (FULL q axis) / seg_row [1, 1, Tk]
    # refs; the [1, Tk] key bias becomes block-diagonal [T, Tk].
    if packed:
        seg_col_ref, seg_row_ref, o_ref, g_ref, lse_ref, dk_ref, dv_ref = rest
        seg = (seg_col_ref, seg_row_ref)
    else:
        o_ref, g_ref, lse_ref, dk_ref, dv_ref = rest
        seg = None
    # FLAT layout: q/o/g full slabs [1, T, Dblk]; k/v/dk/dv blocks
    # [1, Tk, Dblk]; mask block [1, 1, Tk]; lse [1, heads, T, 1]; static loop
    # over head slices. Scale folds into q: s matches the saved (scaled) lse,
    # and because dk = scale * ds_unscaled^T @ q, contracting ds against the
    # PRE-SCALED q delivers the scale for free — no [T, Tk] scale pass.
    # Prefix skipping: k blocks past kvl hold only masked keys, whose true
    # gradient is exactly zero (softmax mass underflows under the -1e9 bias).
    # Padded q rows inside the slab are harmless: their g is zero and their
    # saved LSE is SKIP_LSE, so p underflows instead of overflowing.
    d = q_ref.shape[-1]
    dh = d // heads
    kvl = kvl_ref[pl.program_id(0), 0]
    k_start = pl.program_id(2) * k_ref.shape[1]

    @pl.when(k_start >= kvl)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    @pl.when(k_start < kvl)
    def _body():
        _dkv_compute(
            q_ref, k_ref, v_ref, mask_ref, o_ref, g_ref, lse_ref,
            dk_ref, dv_ref, scale=scale, heads=heads, sm_dtype=sm_dtype,
            seg=seg,
        )


def _dkv_compute(
    q_ref, k_ref, v_ref, mask_ref, o_ref, g_ref, lse_ref, dk_ref, dv_ref,
    *, scale, heads, sm_dtype, seg=None,
):
    d = q_ref.shape[-1]
    dh = d // heads
    ok = mask_ref[0] != 0  # [1, Tk]
    if seg is not None:
        ok = ok & (seg[0][0] == seg[1][0])  # [T, Tk]
        bias = None  # select form (see _bwd_dq_kernel): bool mask, not f32 slab
    else:
        bias = jnp.where(ok, 0.0, NEG_INF)
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = (q_ref[0, :, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
        k = k_ref[0, :, sl]  # [Tk, Dh]
        v = v_ref[0, :, sl]
        g = g_ref[0, :, sl].astype(jnp.float32)
        o = o_ref[0, :, sl].astype(jnp.float32)
        lse = lse_ref[0, h]  # [T, 1]

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, Tk]
        # exact softmax columns via saved logsumexp; [T, Tk] exp/ds passes in
        # sm_dtype (2x VPU rate at bf16)
        if seg is not None:
            p = jnp.where(
                ok, jnp.exp((s - lse).astype(sm_dtype)),
                jnp.zeros((), sm_dtype),
            )
        else:
            p = jnp.exp((s + bias - lse).astype(sm_dtype))

        dv_ref[0, :, sl] = jax.lax.dot_general(
            p.astype(g_ref.dtype), g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            g, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, Tk]
        dterm = jnp.sum(g * o, axis=-1, keepdims=True)  # [T, 1]
        ds = p * (dp - dterm).astype(sm_dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            ds.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _bwd_dkv_stream_kernel(
    q_ref, k_ref, v_ref, mask_ref, kvl_ref, *rest,
    scale: float, heads: int, sm_dtype=jnp.float32, packed: bool = False,
):
    # packed: extra seg_col [1, Qc, 1] (this q chunk) / seg_row [1, 1, Tk]
    # (this k block) refs plus lo/hi [B, n_qchunks] SMEM
    # (_packed_block_bounds at q_chunk granularity): a (k block, q chunk)
    # pair accumulates only when the chunk's own videos overlap the block
    # (lo <= ki < hi) — everything else carries exactly-zero softmax mass.
    if packed:
        seg_col_ref, seg_row_ref, lo_ref, hi_ref = rest[:4]
        o_ref, g_ref, lse_ref, dk_ref, dv_ref, dk_acc, dv_acc = rest[4:]
    else:
        o_ref, g_ref, lse_ref, dk_ref, dv_ref, dk_acc, dv_acc = rest
    # Streaming dk/dv: 4-axis grid (b, d-block, k-block, q-chunk) with the
    # q-chunk axis innermost. Each step fetches only [1, Qc, Dblk] q/o/g
    # blocks (a VMEM-resident full slab per input OOM'd at T=8192 — 28.5M vs
    # the 16M scoped-vmem limit, measured); dk/dv accumulate in f32 SCRATCH
    # across the q sweep (TPU scratch persists over grid steps) and write out
    # once on the last chunk. VMEM is now O(Qc * Tk), independent of T.
    # Prefix skipping: accumulation is skipped when either the q chunk or the
    # k block sits past kvl (zero upstream gradient / exactly-zero softmax
    # mass); scratch still zeroes at qi==0 and writes out at the last chunk,
    # so skipped k blocks emit exact zeros.
    bi = pl.program_id(0)
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    n_q = pl.num_programs(3)
    d = q_ref.shape[-1]
    dh = d // heads
    kvl = kvl_ref[bi, 0]
    q_start = qi * q_ref.shape[1]
    k_start = ki * k_ref.shape[1]

    @pl.when(qi == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    live = (q_start < kvl) & (k_start < kvl)
    if packed:
        live = live & (lo_ref[bi, qi] <= ki) & (ki < hi_ref[bi, qi])

    @pl.when(live)
    def _():
        ok = mask_ref[0] != 0  # [1, Tk]
        if packed:
            ok = ok & (seg_col_ref[0] == seg_row_ref[0])  # [Qc, Tk]
        bias = jnp.where(ok, 0.0, NEG_INF)
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            k = k_ref[0, :, sl]  # [Tk, Dh]
            v = v_ref[0, :, sl]
            q = (q_ref[0, :, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
            g = g_ref[0, :, sl].astype(jnp.float32)
            o = o_ref[0, :, sl].astype(jnp.float32)
            lse = lse_ref[0, h]  # [Qc, 1]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias
            p = jnp.exp((s - lse).astype(sm_dtype))  # [Qc, Tk]
            dv_acc[:, sl] += jax.lax.dot_general(
                p.astype(g_ref.dtype), g,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                g, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dterm = jnp.sum(g * o, axis=-1, keepdims=True)
            ds = p * (dp - dterm).astype(sm_dtype)
            dk_acc[:, sl] += jax.lax.dot_general(
                ds.astype(q.dtype), q,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(qi == n_q - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, key_valid, o, lse, g, q_block: int, k_block: int, interpret: bool,
    sm_dtype=jnp.float32, seg_ids=None,
):
    """All-flat backward: both kernels index the native [B, T, D] layout (the
    [B,T,H,Dh] -> [B,T,D] reshapes are free), so no transposes at all — the
    transposed-layout version paid 8 HBM round trips per layer."""
    b, t, h, dh = q.shape
    d = h * dh
    q_block = _pick_block(t, min(q_block, t))
    k_block = _pick_block(t, min(k_block, t))
    assert q_block and k_block  # guaranteed by the mha_pallas entry check
    scale = 1.0 / (dh ** 0.5)
    d_block = _pick_d_block(d, dh)
    if t > HBM_STREAM_T and HBM_BWD_D_BLOCK is not None:
        hdb = min(HBM_BWD_D_BLOCK, d)
        if d % hdb == 0 and hdb % dh == 0:
            d_block = hdb
    if seg_ids is not None and PACKED_BWD_D_BLOCK is not None:
        # packed dq/dkv rebuild the [Tq, T] seg bias per d-block program like
        # the forward; sweepable via tools/bench_packed_train.py (separate
        # knob — the backward holds more live slabs per program, so the
        # forward's winning d_block can OOM scoped VMEM here)
        pdb = min(PACKED_BWD_D_BLOCK, d)
        if d % pdb == 0 and pdb % dh == 0:
            d_block = max(d_block, pdb)
    heads_per_block = d_block // dh

    qf = q.reshape(b, t, d)
    kf = k.reshape(b, t, d)
    vf = v.reshape(b, t, d)
    of = o.reshape(b, t, d)
    gf = g.reshape(b, t, d)
    mask = key_valid[:, None, :].astype(jnp.int32)
    kvl = _kv_len(key_valid)
    if seg_ids is not None:
        seg_col = seg_ids[:, :, None].astype(jnp.int32)
        seg_row = seg_ids[:, None, :].astype(jnp.int32)
    blk_kvl = pl.BlockSpec(
        (b, 1), lambda bi, di, i: (0, 0), memory_space=pltpu.SMEM
    )

    blk_q = pl.BlockSpec(
        (1, q_block, d_block), lambda bi, di, i: (bi, i, di), memory_space=pltpu.VMEM
    )
    blk_full = pl.BlockSpec(
        (1, t, d_block), lambda bi, di, i: (bi, 0, di), memory_space=pltpu.VMEM
    )
    blk_mask = pl.BlockSpec(
        (1, 1, t), lambda bi, di, i: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    blk_lse_q = pl.BlockSpec(
        (1, heads_per_block, q_block, 1), lambda bi, di, i: (bi, di, i, 0),
        memory_space=pltpu.VMEM,
    )
    dq_stream_t = STREAM_MAX_T if DQ_STREAM_T is None else DQ_STREAM_T
    if t > HBM_STREAM_T:
        # K/V stay in HBM; the kernel DMAs double-buffered chunks itself.
        kb_hbm = _pick_block(t, STREAM_K_BLOCK)
        packed_ins, packed_ops = [], []
        if seg_ids is not None:
            nqb = t // q_block
            lo, hi = _packed_block_bounds(seg_ids, q_block, kb_hbm)
            packed_ins = [
                pl.BlockSpec((1, q_block, 1), lambda bi, di, i: (bi, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t), lambda bi, di, i: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, nqb), lambda bi, di, i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((b, nqb), lambda bi, di, i: (0, 0),
                             memory_space=pltpu.SMEM),
            ]
            packed_ops = [seg_col, seg_row, lo, hi]
        dq = pl.pallas_call(
            functools.partial(
                _bwd_dq_hbm_kernel, scale=scale, heads=heads_per_block,
                k_block=kb_hbm, d_block=d_block, sm_dtype=sm_dtype,
                packed=seg_ids is not None,
            ),
            grid=(b, d // d_block, t // q_block),
            in_specs=[
                blk_q,
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                blk_mask, blk_kvl, *packed_ins, blk_q, blk_q, blk_lse_q,
            ],
            out_specs=blk_q,
            out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, kb_hbm, d_block), k.dtype),
                pltpu.VMEM((2, kb_hbm, d_block), v.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interpret,
            **_cp_kwargs(),
        )(qf, kf, vf, mask, kvl, *packed_ops, of, gf, lse)
    elif seg_ids is not None and t > dq_stream_t:
        # sequence-packed streaming dq: bounded k sweep over VMEM K/V slabs
        kb_dq = _pick_block(t, min(PACKED_K_BLOCK, t))
        nqb = t // q_block
        lo, hi = _packed_block_bounds(seg_ids, q_block, kb_dq)
        dq = pl.pallas_call(
            functools.partial(
                _bwd_dq_packed_stream_kernel, scale=scale,
                heads=heads_per_block, k_block=kb_dq, sm_dtype=sm_dtype,
            ),
            grid=(b, d // d_block, nqb),
            in_specs=[blk_q, blk_full, blk_full, blk_mask, blk_kvl,
                      pl.BlockSpec((1, q_block, 1), lambda bi, di, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1, t), lambda bi, di, i: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((b, nqb), lambda bi, di, i: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((b, nqb), lambda bi, di, i: (0, 0),
                                   memory_space=pltpu.SMEM),
                      blk_q, blk_q, blk_lse_q],
            out_specs=blk_q,
            out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
            interpret=interpret,
            **_cp_kwargs(),
        )(qf, kf, vf, mask, kvl, seg_col, seg_row, lo, hi, of, gf, lse)
    elif seg_ids is not None:
        # sequence packing, corpus buckets: dense dq kernel with
        # block-diagonal [Tq, T] bias
        dq = pl.pallas_call(
            functools.partial(
                _bwd_dq_kernel, scale=scale, heads=heads_per_block,
                sm_dtype=sm_dtype, packed=True,
            ),
            grid=(b, d // d_block, t // q_block),
            in_specs=[blk_q, blk_full, blk_full, blk_mask, blk_kvl,
                      pl.BlockSpec((1, q_block, 1), lambda bi, di, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1, t), lambda bi, di, i: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
                      blk_q, blk_q, blk_lse_q],
            out_specs=blk_q,
            out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
            interpret=interpret,
            **_cp_kwargs(),
        )(qf, kf, vf, mask, kvl, seg_col, seg_row, of, gf, lse)
    else:
        if t > dq_stream_t:
            dq_kernel = functools.partial(
                _bwd_dq_stream_kernel, scale=scale, heads=heads_per_block,
                k_block=_pick_block(t, STREAM_K_BLOCK), sm_dtype=sm_dtype,
            )
        else:
            dq_kernel = functools.partial(
                _bwd_dq_kernel, scale=scale, heads=heads_per_block,
                sm_dtype=sm_dtype,
            )
        dq = pl.pallas_call(
            dq_kernel,
            grid=(b, d // d_block, t // q_block),
            in_specs=[blk_q, blk_full, blk_full, blk_mask, blk_kvl, blk_q, blk_q,
                      blk_lse_q],
            out_specs=blk_q,
            out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
            interpret=interpret,
            **_cp_kwargs(),
        )(qf, kf, vf, mask, kvl, of, gf, lse)

    blk_k = pl.BlockSpec(
        (1, k_block, d_block), lambda bi, di, i: (bi, i, di), memory_space=pltpu.VMEM
    )
    blk_kmask = pl.BlockSpec(
        (1, 1, k_block), lambda bi, di, i: (bi, 0, i), memory_space=pltpu.VMEM
    )
    blk_lse = pl.BlockSpec(
        (1, heads_per_block, t, 1), lambda bi, di, i: (bi, di, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dkv_stream_t = STREAM_MAX_T if DKV_STREAM_T is None else DKV_STREAM_T
    if t > HBM_STREAM_T:
        # HBM regime: the 4-axis dkv kernel revisits its [k_block, d_block]
        # scratch across the whole q sweep — the swept larger key block
        # quarters the revisits (tools/bench_hbm_sweep.py, -20% grad)
        kb_dkv = _pick_block(t, HBM_DKV_K_BLOCK)
        if kb_dkv:
            k_block = kb_dkv
    if seg_ids is not None and t > dkv_stream_t:
        # sequence-packed streaming dk/dv: the unpacked 4-axis grid
        # (b, d-block, k-block, q-chunk) plus the block-diagonal bias; a
        # (k block, q chunk) pair is skipped entirely unless the chunk's own
        # videos overlap the block (lo/hi at q_chunk granularity).
        q_chunk = _pick_block(t, DEFAULT_Q_BLOCK)
        n_qc = t // q_chunk
        lo_q, hi_q = _packed_block_bounds(seg_ids, q_chunk, k_block)
        blk_qc = pl.BlockSpec(
            (1, q_chunk, d_block), lambda bi, di, ki, qi: (bi, qi, di),
            memory_space=pltpu.VMEM,
        )
        blk_k4 = pl.BlockSpec(
            (1, k_block, d_block), lambda bi, di, ki, qi: (bi, ki, di),
            memory_space=pltpu.VMEM,
        )
        blk_kmask4 = pl.BlockSpec(
            (1, 1, k_block), lambda bi, di, ki, qi: (bi, 0, ki),
            memory_space=pltpu.VMEM,
        )
        blk_lse4 = pl.BlockSpec(
            (1, heads_per_block, q_chunk, 1),
            lambda bi, di, ki, qi: (bi, di, qi, 0),
            memory_space=pltpu.VMEM,
        )
        dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_dkv_stream_kernel, scale=scale, heads=heads_per_block,
                sm_dtype=sm_dtype, packed=True,
            ),
            grid=(b, d // d_block, t // k_block, t // q_chunk),
            in_specs=[
                blk_qc, blk_k4, blk_k4, blk_kmask4,
                pl.BlockSpec(
                    (b, 1), lambda bi, di, ki, qi: (0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec((1, q_chunk, 1), lambda bi, di, ki, qi: (bi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, k_block), lambda bi, di, ki, qi: (bi, 0, ki),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, n_qc), lambda bi, di, ki, qi: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((b, n_qc), lambda bi, di, ki, qi: (0, 0),
                             memory_space=pltpu.SMEM),
                blk_qc, blk_qc, blk_lse4,
            ],
            out_specs=(blk_k4, blk_k4),
            out_shape=(
                jax.ShapeDtypeStruct((b, t, d), k.dtype),
                jax.ShapeDtypeStruct((b, t, d), v.dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((k_block, d_block), jnp.float32),
                pltpu.VMEM((k_block, d_block), jnp.float32),
            ],
            interpret=interpret,
        )(qf, kf, vf, mask, kvl, seg_col, seg_row, lo_q, hi_q, of, gf, lse)
    elif seg_ids is not None:
        # sequence packing: dense dkv kernel, block-diagonal [T, Tk] bias
        dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_dkv_kernel, scale=scale, heads=heads_per_block,
                sm_dtype=sm_dtype, packed=True,
            ),
            grid=(b, d // d_block, t // k_block),
            in_specs=[blk_full, blk_k, blk_k, blk_kmask, blk_kvl,
                      pl.BlockSpec((1, t, 1), lambda bi, di, i: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1, k_block), lambda bi, di, i: (bi, 0, i),
                                   memory_space=pltpu.VMEM),
                      blk_full, blk_full, blk_lse],
            out_specs=(blk_k, blk_k),
            out_shape=(
                jax.ShapeDtypeStruct((b, t, d), k.dtype),
                jax.ShapeDtypeStruct((b, t, d), v.dtype),
            ),
            interpret=interpret,
            **_cp_kwargs(),
        )(qf, kf, vf, mask, kvl, seg_col, seg_row, of, gf, lse)
    elif t > dkv_stream_t:
        # 4-axis grid, q-chunk innermost; dk/dv blocks revisit across the q
        # sweep (index_map ignores qi) and accumulate in f32 scratch.
        q_chunk = _pick_block(t, DEFAULT_Q_BLOCK)
        blk_qc = pl.BlockSpec(
            (1, q_chunk, d_block), lambda bi, di, ki, qi: (bi, qi, di),
            memory_space=pltpu.VMEM,
        )
        blk_k4 = pl.BlockSpec(
            (1, k_block, d_block), lambda bi, di, ki, qi: (bi, ki, di),
            memory_space=pltpu.VMEM,
        )
        blk_kmask4 = pl.BlockSpec(
            (1, 1, k_block), lambda bi, di, ki, qi: (bi, 0, ki),
            memory_space=pltpu.VMEM,
        )
        blk_lse4 = pl.BlockSpec(
            (1, heads_per_block, q_chunk, 1),
            lambda bi, di, ki, qi: (bi, di, qi, 0),
            memory_space=pltpu.VMEM,
        )
        dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_dkv_stream_kernel, scale=scale, heads=heads_per_block,
                sm_dtype=sm_dtype,
            ),
            grid=(b, d // d_block, t // k_block, t // q_chunk),
            in_specs=[
                blk_qc, blk_k4, blk_k4, blk_kmask4,
                pl.BlockSpec(
                    (b, 1), lambda bi, di, ki, qi: (0, 0),
                    memory_space=pltpu.SMEM,
                ),
                blk_qc, blk_qc, blk_lse4,
            ],
            out_specs=(blk_k4, blk_k4),
            out_shape=(
                jax.ShapeDtypeStruct((b, t, d), k.dtype),
                jax.ShapeDtypeStruct((b, t, d), v.dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((k_block, d_block), jnp.float32),
                pltpu.VMEM((k_block, d_block), jnp.float32),
            ],
            interpret=interpret,
        )(qf, kf, vf, mask, kvl, of, gf, lse)
    else:
        dkv_kernel = functools.partial(
            _bwd_dkv_kernel, scale=scale, heads=heads_per_block,
            sm_dtype=sm_dtype,
        )
        dk, dv = pl.pallas_call(
            dkv_kernel,
            grid=(b, d // d_block, t // k_block),
            in_specs=[blk_full, blk_k, blk_k, blk_kmask,
                      pl.BlockSpec(
                          (b, 1), lambda bi, di, i: (0, 0),
                          memory_space=pltpu.SMEM,
                      ),
                      blk_full, blk_full, blk_lse],
            out_specs=(blk_k, blk_k),
            out_shape=(
                jax.ShapeDtypeStruct((b, t, d), k.dtype),
                jax.ShapeDtypeStruct((b, t, d), v.dtype),
            ),
            interpret=interpret,
            **_cp_kwargs(),
        )(qf, kf, vf, mask, kvl, of, gf, lse)

    return (
        dq.reshape(b, t, h, dh),
        dk.reshape(b, t, h, dh),
        dv.reshape(b, t, h, dh),
    )


# -- custom VJP --------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _mha_pallas(
    q, k, v, key_valid, seg, q_block, interpret, backward, precision, sm_name,
    packed,
):
    # ``seg`` is a placeholder (key_valid) when packed=False — the static
    # flag, not the operand, decides the kernel variant.
    out, _ = _flash_forward(
        q, k, v, key_valid, q_block, interpret, sm_dtype=_SM_DTYPES[sm_name],
        seg_ids=seg if packed else None,
    )
    return out


def _mha_fwd(
    q, k, v, key_valid, seg, q_block, interpret, backward, precision, sm_name,
    packed,
):
    o, lse = _flash_forward(
        q, k, v, key_valid, q_block, interpret, sm_dtype=_SM_DTYPES[sm_name],
        seg_ids=seg if packed else None,
    )
    return o, (q, k, v, key_valid, seg, o, lse)


def _mha_bwd(q_block, interpret, backward, precision, sm_name, packed, res, g):
    q, k, v, key_valid, seg, o, lse = res
    if backward == "pallas" and _pick_block(
        q.shape[1], min(DEFAULT_K_BLOCK, q.shape[1])
    ) is None:
        # buckets in (256, 512] not divisible by 8: the forward's q block is
        # trivially legal (t itself) but the fused backward has no legal k
        # block — recompute through XLA instead of crashing, keeping the fast
        # Pallas forward for inference-only and backward="xla" callers
        backward = "xla"
    if backward == "pallas":
        dq, dk, dv = _flash_backward(
            q, k, v, key_valid, o, lse, g, q_block, DEFAULT_K_BLOCK, interpret,
            sm_dtype=_SM_DTYPES[sm_name], seg_ids=seg if packed else None,
        )
    else:
        # XLA-recompute backward escape hatch (attention_impl="pallas"):
        # materializes [B,H,T,T] in HBM — measured 1.57x SLOWER than the
        # fused kernels at T=2048 on v5e.
        _, vjp = jax.vjp(
            lambda a, b, c: mha_xla(
                a, b, c, key_valid, precision=precision,
                seg_ids=seg if packed else None,
            ),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_mha_pallas.defvjp(_mha_fwd, _mha_bwd)


_SM_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def mha_pallas(
    q: Array, k: Array, v: Array, key_valid: Array,
    q_block: int | None = None,
    interpret: bool | None = None,
    backward: str = "pallas",
    precision: str = "default",
    softmax_dtype: str = "float32",
    seg_ids: Array | None = None,
) -> Array:
    """Drop-in replacement for ``mha_xla`` (same signature/semantics on valid
    rows). Runs interpreted off-TPU so CPU tests exercise the same code.
    ``backward``: "xla" (recompute) or "pallas" (fused two-kernel).
    ``precision`` governs the XLA paths only (fallback + recompute backward);
    the Pallas kernels always accumulate in float32.

    Sequence lengths with no usable power-of-two block divisor (e.g. odd
    buckets) fall back to the XLA path instead of mistiling — a legal bucket
    config never crashes or truncates in the kernel.

    ``seg_ids`` ([B, T] int32, -1 on padding) enables SEQUENCE PACKING:
    attention goes block-diagonal so videos sharing a row never attend each
    other (see mha_xla). Packed fast paths cover EVERY T window the unpacked
    kernels do: dense slab (t <= STREAM_MAX_T), bounded-sweep streaming
    (<= HBM_STREAM_T), and HBM-resident double-buffered DMA beyond — so
    sequence packing composes with long-video buckets (multi-hour packed
    rows) instead of falling back to an XLA [B, H, T, T] score tensor."""
    packed = seg_ids is not None
    if q_block is None:
        # resolved at CALL time so sweeps can retune the module defaults
        q_block = PACKED_Q_BLOCK if packed else DEFAULT_Q_BLOCK
    picked = _pick_block(q.shape[1], min(q_block, q.shape[1]))
    # (buckets whose FUSED backward has no legal k block — t in (256, 512]
    # not divisible by 8 — keep the fast Pallas forward; _mha_bwd swaps in
    # the XLA-recompute backward for them)
    if picked is None:
        return mha_xla(q, k, v, key_valid, precision=precision, seg_ids=seg_ids)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _mha_pallas(
        q, k, v, key_valid, seg_ids if packed else key_valid,
        picked, interpret, backward, precision, softmax_dtype, packed,
    )
