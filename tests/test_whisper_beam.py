"""Beam-search decode tests.

``beam_decode`` (beams folded into the batch, KV-cached steps, one top_k per
iteration) validates against a TRANSPARENT reference beam implemented here
with teacher-forced FULL decoder forwards and plain Python loops — same
semantics by construction (finished hypotheses extend only via EOT at zero
cost; final pick by length-normalized cumulative log-prob), so any
disagreement is a bug in the fast path's bookkeeping (KV gathers,
back-pointers, prompt phase)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from repurpose_tpu.extractors.whisper_jax import (
    WhisperASR,
    WhisperDecoder,
    _rules_for_position,
    _suppress_mask,
    beam_decode,
    greedy_decode,
)


def _reference_beam(decoder, dec_p, enc_row, prompt, w, l, cfg, with_ts):
    """Slow oracle with openai BeamSearchDecoder semantics: hypotheses as
    explicit lists, full teacher-forced forward per step (no KV cache);
    per-source top-(w+1) candidate expansion; candidates scanned in score
    order — EOT ones join the finished pool (first-come, capped at w, no
    eviction), the rest refill the live beam until w; stop when w finished;
    final pick by score / length-excluding-EOT (MaximumLikelihoodRanker)."""
    suppress = jnp.asarray(_suppress_mask(cfg))
    hyps = [(list(prompt), 0.0)]
    finished: list[tuple[list, float, int]] = []  # (tokens, score, n_sampled)
    p = len(prompt)
    for pos in range(p - 1, l - 1):
        cands = []
        for tokens, score in hyps:
            padded = tokens + [cfg.eot] * (l - len(tokens))
            logits = decoder.apply(
                {"params": dec_p}, jnp.asarray([padded], jnp.int32),
                enc_row[None],
            )[0, pos]
            if with_ts:
                logits = _rules_for_position(
                    logits[None], jnp.asarray([padded], jnp.int32),
                    jnp.asarray(pos), p, cfg, suppress,
                )[0]
            logp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32)))
            for t in np.argsort(-logp)[: w + 1]:
                cands.append((tokens + [int(t)], score + float(logp[t])))
        cands.sort(key=lambda c: -c[1])
        hyps = []
        step_finished = []
        for tokens, score in cands:
            if tokens[-1] == cfg.eot:
                step_finished.append((tokens, score, pos + 1 - p))
            else:
                hyps.append((tokens, score))
                if len(hyps) == w:
                    break
        for entry in step_finished:  # already in score order
            if len(finished) >= w:
                break
            finished.append(entry)
        if len(finished) >= w:
            break
    if len(finished) < w and hyps:
        # openai finalize: pad the finished pool with the best live
        # hypotheses until it holds w entries (not only when empty)
        hyps.sort(key=lambda c: -c[1])
        for tokens, score in hyps[: w - len(finished)]:
            finished.append((tokens, score, max(len(tokens) - p, 1)))
    best, best_rank = None, -np.inf
    for tokens, score, n_sampled in finished:
        rank = score / max(n_sampled, 1)
        if rank > best_rank:
            best_rank, best = rank, tokens
    return best + [cfg.eot] * (l - len(best))


@pytest.mark.parametrize("with_ts", [False, True])
@pytest.mark.parametrize("w", [2, 3])
def test_beam_matches_transparent_reference(tiny, with_ts, w):  # noqa: F811
    _, cfg, _, dec_p = tiny
    dec = WhisperDecoder(cfg)
    rng = np.random.default_rng(31)
    enc = jnp.asarray(
        rng.normal(0, 1, (2, cfg.max_source_positions, cfg.d_model)).astype(np.float32)
    )
    prompt = (cfg.sot, cfg.lang_begin, cfg.transcribe)
    got = np.asarray(
        beam_decode(dec, {"params": dec_p}, enc, prompt, w, with_ts)
    )
    for row in range(enc.shape[0]):
        want = _reference_beam(
            dec, dec_p, enc[row], prompt, w, cfg.max_target_positions, cfg,
            with_ts,
        )
        np.testing.assert_array_equal(got[row], want)


def test_beam_one_equals_greedy(tiny):  # noqa: F811
    _, cfg, _, dec_p = tiny
    dec = WhisperDecoder(cfg)
    rng = np.random.default_rng(32)
    enc = jnp.asarray(
        rng.normal(0, 1, (3, cfg.max_source_positions, cfg.d_model)).astype(np.float32)
    )
    prompt = (cfg.sot, cfg.lang_begin, cfg.transcribe)
    g = np.asarray(greedy_decode(dec, {"params": dec_p}, enc, prompt))
    b1 = np.asarray(beam_decode(dec, {"params": dec_p}, enc, prompt, 1, True))
    np.testing.assert_array_equal(g, b1)


def test_asr_beam_end_to_end(tiny):  # noqa: F811
    """transcribe_wave routes through beam_decode when beam_size > 1 and
    still produces well-formed segments."""
    _, cfg, enc_p, dec_p = tiny

    class Tok:
        def decode(self, ids):
            return " ".join(f"w{i}" for i in ids)

    asr = WhisperASR(cfg, enc_p, dec_p, Tok(), max_chunk_batch=2, beam_size=3)
    rng = np.random.default_rng(33)
    wave = rng.normal(0, 0.1, 16000 * 35).astype(np.float32)
    segs = asr.transcribe_wave(wave)
    assert segs
    for s in segs:
        assert 0 <= s["start"] <= s["end"] <= 60 and s["text"]
