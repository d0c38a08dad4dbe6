#!/usr/bin/env python
"""Secondary benchmark: feature-extractor throughput on TPU.

The reference extracts features one frame / one chunk / one sentence at a
time on GPU (SURVEY.md §3.4 hot spots: unbatched per-frame CLIP encode at
visual_feature_extractor_clip.py:184-199, per-video PANNs reconstruction,
per-second SBERT encodes). Here everything runs as large jitted batches;
this script reports items/s per extractor (random weights — architecture
throughput, independent of checkpoints).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

#: Analytic A100 denominator for the reference pipeline, per extractor, in
#: items/s — built the same way as BASELINE.md's scoring denominator
#: (generous to the reference; assumptions stated in BASELINE.md "Extractor
#: throughput" section). The reference runs every model batch-1 in eager
#: torch: per-frame CLIP encode incl. host PIL preprocess
#: (visual_feature_extractor_clip.py:184-199), per-1s-chunk CNN14
#: `at.inference` incl. the per-VIDEO AudioTagging reconstruction
#: (audio_feature_extractor.py:125-142), whisperx transcription + per-second
#: batch-1 SBERT encodes (text_feature_extractor.py:338-376).
A100_REFERENCE = {
    "clip_frames_per_s": 125.0,      # ~8 ms/frame: 3-5 ms PIL+preprocess + batch-1 ViT-B/32
    "cnn14_audio_s_per_s": 94.0,     # ~7 ms/chunk batch-1 + ~5 s model reload / 1218 s video
    "whisper_audio_s_per_s": 100.0,  # whisperx base, batched GPU decode ~100x real-time
    "minilm_sentences_per_s": 250.0, # ~4 ms batch-1 SBERT encode
}


def _a100_video_seconds_per_s() -> float:
    d = A100_REFERENCE
    return 1.0 / (
        1.0 / d["clip_frames_per_s"]
        + 1.0 / d["cnn14_audio_s_per_s"]
        + 1.0 / d["whisper_audio_s_per_s"]
        + 1.0 / d["minilm_sentences_per_s"]
    )


def _bench(fn, *args, n=10):
    # Fetch (not block_until_ready) forces remote completion through the
    # device tunnel; stream ordering means fetching the LAST output syncs
    # every dispatched iteration with one amortized RPC.
    np.asarray(fn(*args))  # compile + fetch
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n


def main(json_path: str | None = None) -> None:
    from repurpose_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    rng = np.random.default_rng(0)
    rates: dict = {"device": jax.devices()[0].device_kind}

    # CLIP ViT-B/32: 1 frame = 1 video-second of the visual stream.
    from repurpose_tpu.extractors.clip_vit import CLIPVisionEncoder

    clip = CLIPVisionEncoder()
    b = 256
    imgs = jnp.asarray(rng.normal(0, 1, (b, 224, 224, 3)), jnp.float32)
    params = jax.jit(lambda r: clip.init(r, imgs[:8])["params"])(jax.random.key(0))
    dt = _bench(jax.jit(lambda p, x: clip.apply({"params": p}, x)), params, imgs)
    rates["clip_frames_per_s"] = round(b / dt, 1)
    print(f"CLIP ViT-B/32: {b / dt:,.0f} frames/s (batch {b})")

    # CNN14: 1 chunk = 1 video-second of the audio stream (22050 samples).
    from repurpose_tpu.extractors.audio_frontend import logmel
    from repurpose_tpu.extractors.cnn14 import CNN14

    cnn = CNN14()
    bw = 512
    waves = jnp.asarray(rng.normal(0, 0.1, (bw, 22050)), jnp.float32)
    mel8 = logmel(waves[:8])
    aparams = jax.jit(lambda r: cnn.init(r, mel8)["params"])(jax.random.key(1))
    fn = jax.jit(lambda p, w: cnn.apply({"params": p}, logmel(w)))
    dt = _bench(fn, aparams, waves)
    rates["cnn14_audio_s_per_s"] = round(bw / dt, 1)
    print(f"CNN14: {bw / dt:,.0f} audio-seconds/s (batch {bw})")

    # MiniLM: 1 sentence = 1 transcribed video-second of the text stream.
    from repurpose_tpu.extractors.minilm import MiniLMEncoder

    mlm = MiniLMEncoder()
    bt, tl = 512, 64
    ids = jnp.asarray(rng.integers(0, 30000, (bt, tl)), jnp.int32)
    mask = jnp.ones((bt, tl), jnp.int32)
    tparams = jax.jit(lambda r: mlm.init(r, ids[:8], mask[:8])["params"])(jax.random.key(2))
    dt = _bench(jax.jit(lambda p, i, m: mlm.apply({"params": p}, i, m)), tparams, ids, mask)
    rates["minilm_sentences_per_s"] = round(bt / dt, 1)
    print(f"MiniLM-L6: {bt / dt:,.0f} sentences/s (batch {bt})")

    # Whisper-base: ASR throughput in audio-seconds/s. Encoder at real dims;
    # decode capped at 64 tokens/chunk (typical speech density) — the greedy
    # loop is sequential, so tokens/chunk dominates wall time.
    from repurpose_tpu.extractors.whisper_jax import (
        WhisperDecoder,
        WhisperEncoder,
        WhisperJaxConfig,
        greedy_decode,
        log_mel_whisper,
    )

    wcfg = WhisperJaxConfig(max_target_positions=64)
    bc = 8  # 30 s chunks per batch = 4 min of audio per program
    wenc = WhisperEncoder(wcfg, compute_dtype="bfloat16")
    wdec = WhisperDecoder(wcfg, compute_dtype="bfloat16")
    wav = jnp.asarray(rng.normal(0, 0.1, (bc, 480000)), jnp.float32)
    mel = log_mel_whisper(wav)
    wparams = jax.jit(lambda r: wenc.init(r, mel[:1])["params"])(jax.random.key(3))
    dparams = jax.jit(
        lambda r: wdec.init(
            r, jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 1500, wcfg.d_model))
        )["params"]
    )(jax.random.key(4))

    def asr(wav):
        enc = wenc.apply({"params": wparams}, log_mel_whisper(wav))
        return greedy_decode(
            wdec, {"params": dparams}, enc,
            (wcfg.sot, wcfg.lang_begin, wcfg.transcribe),
        )

    dt = _bench(asr, wav, n=3)
    rates["whisper_audio_s_per_s"] = round(bc * 30 / dt, 1)
    print(
        f"Whisper-base ASR: {bc * 30 / dt:,.0f} audio-seconds/s "
        f"(batch {bc} x 30 s chunks, <=61 tokens/chunk)"
    )

    from repurpose_tpu.extractors.whisper_jax import beam_decode

    def asr_beam(wav):
        enc = wenc.apply({"params": wparams}, log_mel_whisper(wav))
        return beam_decode(
            wdec, {"params": dparams}, enc,
            (wcfg.sot, wcfg.lang_begin, wcfg.transcribe), 5,
        )

    dt = _bench(asr_beam, wav, n=3)
    rates["whisper_beam5_audio_s_per_s"] = round(bc * 30 / dt, 1)
    print(
        f"Whisper-base ASR beam=5: {bc * 30 / dt:,.0f} audio-seconds/s "
        f"(the beam rides the batch — launch-latency-bound decode)"
    )

    # Word alignment: teacher-forced cross-attention matrix (TPU) + DTW (C++)
    # — the per-chunk cost of word_timestamps=True on top of ASR.
    from repurpose_tpu.extractors.whisper_align import WhisperAligner
    from repurpose_tpu.native import dtw_path

    aligner = WhisperAligner(
        wdec, {"params": dparams}, (wcfg.sot, wcfg.lang_begin, wcfg.transcribe)
    )
    rows = [list(range(100, 140)) for _ in range(bc)]  # 40 text tokens/chunk

    def align(_wav):
        enc = wenc.apply({"params": wparams}, log_mel_whisper(_wav))
        return aligner.align_block(rows, enc, [480000] * bc)

    mats = align(wav)
    t0 = time.perf_counter()
    n_align = 3
    for _ in range(n_align):
        mats = align(wav)
        for m in mats:
            dtw_path(-m)
    dt = (time.perf_counter() - t0) / n_align
    rates["aligner_audio_s_per_s"] = round(bc * 30 / dt, 1)
    print(
        f"Word aligner: {bc * 30 / dt:,.0f} aligned audio-seconds/s "
        f"(batch {bc}, 40 words/chunk, incl. C++ DTW)"
    )

    # Aggregate headline: one corpus video-second needs 1 CLIP frame +
    # 1 CNN14 second + 1/30 of a Whisper 30 s chunk + <=1 MiniLM sentence
    # (upper bound: the reference encodes only speech-bearing seconds) —
    # serial composition on one chip, same formula for both stacks.
    tpu_vps = 1.0 / sum(
        1.0 / rates[k]
        for k in ("clip_frames_per_s", "cnn14_audio_s_per_s",
                  "whisper_audio_s_per_s", "minilm_sentences_per_s")
    )
    a100_vps = _a100_video_seconds_per_s()
    rates["video_seconds_per_s_per_chip"] = round(tpu_vps, 1)
    rates["a100_video_seconds_per_s"] = round(a100_vps, 1)
    rates["vs_a100"] = round(tpu_vps / a100_vps, 2)
    line = {
        "metric": "preprocess_video_seconds_per_s_per_chip",
        "value": rates["video_seconds_per_s_per_chip"],
        "unit": "video-seconds/s/chip",
        "vs_baseline": rates["vs_a100"],
        "detail": rates,
    }
    print(json.dumps(line))
    if json_path:
        with open(json_path, "w") as f:
            json.dump(line, f, indent=1)


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else None)
