"""Whisper greedy-decode throughput sweep: chunk-batch size x stored weight
dtype.

ROADMAP open thread: the KV-cached decode is a sequential lax.while_loop —
per-step cost should be dominated by reading the decoder weights from HBM
(every step touches all of them once). Two levers, measured back-to-back in
one process (TPU timings fluctuate ~5x between runs on this box):

1. BATCH: more 30 s chunks per program amortize the per-step weight read
   over more audio-seconds. from_hf_dir defaults max_chunk_batch=16.
2. STORED WEIGHT DTYPE: flax Dense(dtype=bf16) casts at use, so even the
   bf16 compute path READS float32 weight bytes. Storing the decoder tree
   as bfloat16 halves the per-step HBM traffic; if the loop really is
   weight-bandwidth-bound this is ~2x. (Accuracy note: greedy argmax over
   bf16-weight logits can flip rare near-tie tokens — measure before
   shipping as a default; HF-parity tests pin float32.)

Synthetic low-amplitude noise decodes few tokens per chunk; the token
budget is capped at 64 (typical speech density) so the sweep measures the
steady-state per-step cost, matching bench_extractors.py's setup.

Run on the real chip:  python tools/bench_whisper_decode.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tools._bench_common import log, time_best


def main() -> None:
    from repurpose_tpu.extractors.whisper_jax import (
        WhisperDecoder,
        WhisperEncoder,
        WhisperJaxConfig,
        greedy_decode,
        log_mel_whisper,
    )

    rng = np.random.default_rng(0)
    wcfg = WhisperJaxConfig(max_target_positions=64)
    wenc = WhisperEncoder(wcfg, compute_dtype="bfloat16")
    wdec = WhisperDecoder(wcfg, compute_dtype="bfloat16")
    mel1 = log_mel_whisper(jnp.asarray(rng.normal(0, 0.1, (1, 480000)), jnp.float32))
    eparams = jax.jit(lambda r: wenc.init(r, mel1)["params"])(jax.random.key(3))
    dparams = jax.jit(
        lambda r: wdec.init(
            r, jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 1500, wcfg.d_model))
        )["params"]
    )(jax.random.key(4))
    prompt = (wcfg.sot, wcfg.lang_begin, wcfg.transcribe)

    n_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(dparams))
    log(f"decoder params: {n_bytes/1e6:.0f} MB stored float32")

    results = {}
    for dtype_name, cast in (("f32", None), ("bf16", jnp.bfloat16)):
        dp = dparams if cast is None else jax.tree.map(
            lambda x: x.astype(cast) if x.dtype == jnp.float32 else x, dparams
        )
        dvars = {"params": jax.tree.map(jnp.asarray, dp)}
        evars = {"params": jax.tree.map(jnp.asarray, eparams)}
        # params as jit ARGUMENTS (CLAUDE.md relay rule — a closed-over tree
        # inflates each batch-size specialization's compile request)
        encode = jax.jit(lambda v, m: wenc.apply(v, m))
        for bc in (8, 16, 32, 64):
            wav = jnp.asarray(rng.normal(0, 0.1, (bc, 480000)), jnp.float32)
            enc = encode(evars, log_mel_whisper(wav))
            enc.block_until_ready()

            def decode(e):
                return greedy_decode(wdec, dvars, e, prompt)

            dt = time_best(decode, enc, reps=3)
            aps = bc * 30 / dt
            results[(dtype_name, bc)] = aps
            log(
                f"weights {dtype_name} batch {bc:>2}: decode {dt*1e3:7.1f} ms "
                f"-> {aps:7.0f} audio-s/s"
            )

    base = results.get(("f32", 16))
    if base:
        for k, v in results.items():
            log(f"  {k}: {v/base:.2f}x vs f32/16")


if __name__ == "__main__":
    main()
