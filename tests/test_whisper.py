"""Whisper-on-TPU parity and decode tests.

Architecture + conversion validate against a randomly-initialized HF
WhisperForConditionalGeneration (the same checkpoints the reference's ASR
stage loads pretrained, text_feature_extractor.py:129-160); the frontend
validates against HF WhisperFeatureExtractor's numpy STFT. Tiny dims, full
vocab (HF requires vocab > pad id 50256)."""

import numpy as np
import pytest
import torch

from repurpose_tpu.extractors.whisper_jax import (
    CHUNK_S,
    N_SAMPLES,
    WhisperASR,
    WhisperDecoder,
    WhisperEncoder,
    WhisperJaxConfig,
    config_from_hf,
    convert_hf_whisper,
    greedy_decode,
    log_mel_whisper,
    tokens_to_segments,
)

import jax
import jax.numpy as jnp




def test_config_from_hf_token_layout(tiny):
    _, cfg, _, _ = tiny
    # multilingual vocab layout (openai/whisper tokenizer)
    assert cfg.eot == 50257 and cfg.sot == 50258
    assert cfg.transcribe == 50359 and cfg.no_timestamps == 50363
    assert cfg.timestamp_begin == 50364


def test_encoder_matches_hf(tiny):
    hf, cfg, enc_p, _ = tiny
    rng = np.random.default_rng(0)
    mel = rng.normal(0, 1, (2, cfg.n_mels, 2 * cfg.max_source_positions)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    enc = WhisperEncoder(cfg)
    got = np.asarray(enc.apply({"params": enc_p}, jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_decoder_teacher_forced_matches_hf(tiny):
    hf, cfg, enc_p, dec_p = tiny
    rng = np.random.default_rng(1)
    mel = rng.normal(0, 1, (2, cfg.n_mels, 2 * cfg.max_source_positions)).astype(
        np.float32
    )
    toks = rng.integers(0, 1000, (2, 7)).astype(np.int64)
    with torch.no_grad():
        ref = hf(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(toks),
        ).logits.numpy()
    enc = WhisperEncoder(cfg).apply(
        {"params": enc_p}, jnp.asarray(mel.transpose(0, 2, 1))
    )
    got = np.asarray(
        WhisperDecoder(cfg).apply(
            {"params": dec_p}, jnp.asarray(toks.astype(np.int32)), enc
        )
    )
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=2e-3)


def test_cached_step_matches_teacher_forced(tiny):
    """The KV-cached step path must reproduce the full forward exactly —
    this is what greedy_decode runs."""
    _, cfg, enc_p, dec_p = tiny
    rng = np.random.default_rng(2)
    enc = jnp.asarray(rng.normal(0, 1, (2, cfg.max_source_positions, cfg.d_model)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, 1000, (2, 6)).astype(np.int32))
    dec = WhisperDecoder(cfg)
    full = np.asarray(dec.apply({"params": dec_p}, toks, enc))

    cross = dec.apply({"params": dec_p}, enc, method=WhisperDecoder.precompute_cross)
    l = cfg.max_target_positions
    kv = (
        jnp.zeros((2, cfg.dec_layers, l, cfg.d_model), jnp.float32),
        jnp.zeros((2, cfg.dec_layers, l, cfg.d_model), jnp.float32),
    )
    for pos in range(toks.shape[1]):
        logits, kv = dec.apply(
            {"params": dec_p}, toks[:, pos], jnp.int32(pos), kv, cross,
            method=WhisperDecoder.step,
        )
        np.testing.assert_allclose(
            np.asarray(logits), full[:, pos], atol=1e-4, rtol=1e-3
        )


def test_greedy_decode_matches_stepwise_argmax(tiny):
    """greedy_decode (scan + rules off) == hand-rolled argmax loop over the
    teacher-forced forward."""
    _, cfg, enc_p, dec_p = tiny
    rng = np.random.default_rng(3)
    enc = jnp.asarray(
        rng.normal(0, 1, (2, cfg.max_source_positions, cfg.d_model)).astype(np.float32)
    )
    dec = WhisperDecoder(cfg)
    prompt = (cfg.sot,)
    got = np.asarray(
        greedy_decode(dec, {"params": dec_p}, enc, prompt, with_timestamps=False)
    )

    toks = np.full((2, cfg.max_target_positions), cfg.eot, np.int32)
    toks[:, 0] = prompt[0]
    done = np.zeros(2, bool)
    for pos in range(cfg.max_target_positions - 1):
        logits = np.asarray(
            dec.apply({"params": dec_p}, jnp.asarray(toks[:, : pos + 1]), enc)
        )[:, -1]
        nxt = logits.argmax(-1).astype(np.int32)
        nxt = np.where(done, cfg.eot, nxt)
        done |= nxt == cfg.eot
        toks[:, pos + 1] = nxt
        if done.all():
            break
    np.testing.assert_array_equal(got, toks)


def test_greedy_timestamp_rules_produce_segments(tiny):
    """With rules on, output must parse into well-formed segments: paired,
    monotone timestamps; suppressed specials never emitted."""
    _, cfg, enc_p, dec_p = tiny
    rng = np.random.default_rng(4)
    enc = jnp.asarray(
        rng.normal(0, 1, (3, cfg.max_source_positions, cfg.d_model)).astype(np.float32)
    )
    dec = WhisperDecoder(cfg)
    tokens = np.asarray(
        greedy_decode(dec, {"params": dec_p}, enc, (cfg.sot, cfg.lang_begin, cfg.transcribe))
    )
    for row in tokens:
        gen = row[3:]
        gen = gen[gen != cfg.eot]
        assert cfg.no_timestamps not in gen and cfg.sot not in gen
        if len(gen):
            # first sampled token is a timestamp within the initial cap
            assert gen[0] >= cfg.timestamp_begin
            assert gen[0] <= cfg.timestamp_begin + cfg.max_initial_timestamp_index
            ts = gen[gen >= cfg.timestamp_begin]
            assert (np.diff(ts) >= 0).all(), "timestamps must be monotone"
        segs = tokens_to_segments(row[3:], cfg, lambda ids: " ".join(map(str, ids)))
        for s in segs:
            assert 0 <= s["start"] <= s["end"] <= CHUNK_S


def test_bfloat16_decode_path_runs(tiny):
    """compute_dtype='bfloat16' (the from_hf_dir default) must run the full
    cached greedy decode — regression: decoder Dense layers without a dtype
    promoted to float32 and broke the bf16 KV-cache update."""
    _, cfg, enc_p, dec_p = tiny

    class Tok:
        def decode(self, ids):
            return " ".join(f"w{i}" for i in ids)

    asr = WhisperASR(cfg, enc_p, dec_p, Tok(), compute_dtype="bfloat16")
    rng = np.random.default_rng(21)
    wave = rng.normal(0, 0.1, 16000 * 3).astype(np.float32)
    segs = asr.transcribe_wave(wave, word_timestamps=True)
    assert isinstance(segs, list)  # empty is fine for random weights


def test_timestamp_rules_strict_monotonicity(tiny):
    """OpenAI's timestamp_last rule: after TEXT the next timestamp must be
    STRICTLY greater than the running max (no zero-length segments); while
    pairing (last token is a closing timestamp) equality is allowed."""
    from repurpose_tpu.extractors.whisper_jax import (
        _apply_timestamp_rules,
        _suppress_mask,
    )

    _, cfg, _, _ = tiny
    ts0 = cfg.timestamp_begin
    suppress = jnp.asarray(_suppress_mask(cfg))
    logits = jnp.zeros((1, cfg.vocab_size), jnp.float32)
    text_tok = jnp.asarray([100])
    ts5 = jnp.asarray([ts0 + 5])
    max5 = jnp.asarray([ts0 + 5])
    yes = jnp.asarray([True])

    # last = text, a timestamp t5 already emitted -> t5 blocked, t6 open
    out = np.asarray(
        _apply_timestamp_rules(
            logits, text_tok, ts5, max5, yes, jnp.asarray(False), cfg, suppress
        )
    )[0]
    assert out[ts0 + 5] <= -1e8 and out[ts0 + 6] == 0.0

    # pairing: last = t5 (closing), penult = text -> equality allowed
    out = np.asarray(
        _apply_timestamp_rules(
            logits, ts5, text_tok, max5, yes, jnp.asarray(False), cfg, suppress
        )
    )[0]
    assert out[ts0 + 5] == 0.0 and out[ts0 + 4] <= -1e8

    # no timestamp yet (has_ts False): ts0 itself must stay available
    out = np.asarray(
        _apply_timestamp_rules(
            logits, text_tok, text_tok, jnp.asarray([ts0]),
            jnp.asarray([False]), jnp.asarray(False), cfg, suppress,
        )
    )[0]
    assert out[ts0] == 0.0


def test_timestamp_rules_first_pair_state(tiny):
    """State machine right after the FIRST sampled (segment-opening)
    timestamp — openai's len(seq)<2 clause makes the penultimate slot read as
    timestamp, so TEXT must be allowed and timestamps blocked. The round-2
    regression fed prompt tokens into the penultimate slot instead, which
    made the opener look like a segment CLOSER, forced a second timestamp,
    and decoded EVERY transcription to empty-text pairs."""
    from repurpose_tpu.extractors.whisper_jax import (
        _apply_timestamp_rules,
        _suppress_mask,
    )

    _, cfg, _, _ = tiny
    ts0 = cfg.timestamp_begin
    suppress = jnp.asarray(_suppress_mask(cfg))
    logits = jnp.zeros((1, cfg.vocab_size), jnp.float32)
    out = np.asarray(
        _apply_timestamp_rules(
            logits,
            jnp.asarray([ts0 + 3]),  # last sampled = opening timestamp
            jnp.asarray([ts0]),  # len(seq) < 2 marker (reads as timestamp)
            jnp.asarray([ts0 + 3]),
            jnp.asarray([True]),
            jnp.asarray(False),
            cfg,
            suppress,
        )
    )[0]
    assert out[100] == 0.0, "text must follow the opening timestamp"
    assert out[ts0 + 7] <= -1e8, "no third timestamp inside an open segment"

    # first sampled token: openai masks EVERYTHING below timestamp_begin,
    # EOT included — a chunk always opens with a timestamp
    out = np.asarray(
        _apply_timestamp_rules(
            logits, jnp.asarray([cfg.sot]), jnp.asarray([ts0]),
            jnp.asarray([ts0]), jnp.asarray([False]), jnp.asarray(True),
            cfg, suppress,
        )
    )[0]
    assert out[cfg.eot] <= -1e8 and out[100] <= -1e8 and out[ts0] == 0.0


def test_config_from_hf_english_only():
    """*.en checkpoints (vocab 51864) must get the bare <|sot|> prompt."""
    from transformers import WhisperConfig

    hf_cfg = WhisperConfig(
        vocab_size=51864, num_mel_bins=8, d_model=16, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=32, decoder_ffn_dim=32, max_source_positions=1500,
        max_target_positions=24,
    )
    cfg = config_from_hf(hf_cfg)
    assert cfg.eot == 50256 and cfg.sot == 50257 and cfg.n_langs == 0

    class Tok:
        def decode(self, ids):
            return "x"

    import flax.linen as nn

    enc = WhisperEncoder(cfg)
    dec = WhisperDecoder(cfg)
    key = jax.random.key(0)
    enc_p = enc.init(key, jnp.zeros((1, 8, cfg.n_mels)))["params"]
    dec_p = dec.init(key, jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 4, cfg.d_model)))["params"]
    asr = WhisperASR(cfg, enc_p, dec_p, Tok())
    assert asr.prompt == (cfg.sot,)


def test_detect_language_matches_hf_logits(tiny):
    """openai detect_language: one decoder step on <|sot|>, argmax over the
    99 language tokens — must agree with the HF model's logits for the same
    mel (the reference reads whisperx's result['language'],
    text_feature_extractor.py:131)."""
    from repurpose_tpu.extractors.whisper_jax import log_mel_whisper

    hf, cfg, enc_p, dec_p = tiny

    class Tok:
        def decode(self, ids):
            return "x"

    asr = WhisperASR(cfg, enc_p, dec_p, Tok())
    rng = np.random.default_rng(17)
    wave = rng.normal(0, 0.1, 16000 * 5).astype(np.float32)
    lang_id, prob = asr.detect_language(wave)
    assert cfg.lang_begin <= lang_id < cfg.lang_begin + cfg.n_langs
    assert 0.0 < prob <= 1.0

    padded = np.zeros(N_SAMPLES, np.float32)
    padded[: len(wave)] = wave
    mel = np.asarray(log_mel_whisper(padded[None], n_mels=cfg.n_mels))
    with torch.no_grad():
        logits = hf(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1).copy()),
            decoder_input_ids=torch.tensor([[cfg.sot]]),
        ).logits[0, -1].numpy()
    want = cfg.lang_begin + int(
        np.argmax(logits[cfg.lang_begin : cfg.lang_begin + cfg.n_langs])
    )
    assert lang_id == want


def test_auto_language_prompts_decode(tiny, monkeypatch):
    """auto_language=True: the detected token lands in the decode prompt.
    (The aligner takes the same per-video prompt via align_block's ``prompt``
    argument — covered by test_whisper_align.)"""
    import repurpose_tpu.extractors.whisper_jax as wj

    _, cfg, enc_p, dec_p = tiny

    class Tok:
        def decode(self, ids):
            return " ".join(f"w{i}" for i in ids)

    asr = WhisperASR(cfg, enc_p, dec_p, Tok(), auto_language=True)
    fake_lang = cfg.lang_begin + 7
    monkeypatch.setattr(asr, "detect_language", lambda w: (fake_lang, 0.9))
    seen = {}

    def fake_decode(decoder, variables, enc, prompt, with_timestamps=True):
        seen["prompt"] = prompt
        return jnp.full((enc.shape[0], cfg.max_target_positions), cfg.eot, jnp.int32)

    monkeypatch.setattr(wj, "greedy_decode", fake_decode)
    asr.transcribe_wave(np.zeros(16000, np.float32))
    assert seen["prompt"] == (cfg.sot, fake_lang, cfg.transcribe)


def test_log_mel_matches_hf_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()  # offline: builds mel filters in numpy
    rng = np.random.default_rng(5)
    wave = (rng.normal(0, 0.1, N_SAMPLES)).astype(np.float32)
    ref = fe(wave, sampling_rate=16000, return_tensors="np", padding="max_length")[
        "input_features"
    ][0]  # [80, 3000]
    got = np.asarray(log_mel_whisper(jnp.asarray(wave[None])))[0]  # [3000, 80]
    np.testing.assert_allclose(got.T, ref, atol=1e-4, rtol=1e-4)


def test_whisper_asr_end_to_end(tiny):
    """Chunking + batched decode + segment offsets through WhisperASR on a
    65 s waveform (3 chunks)."""
    _, cfg, enc_p, dec_p = tiny

    class Tok:
        def decode(self, ids):
            return " ".join(f"w{i}" for i in ids)

    asr = WhisperASR(cfg, enc_p, dec_p, Tok(), max_chunk_batch=2)
    rng = np.random.default_rng(6)
    wave = rng.normal(0, 0.1, int(16000 * 65.0)).astype(np.float32)
    segs = asr.transcribe_wave(wave)
    # even a random model must transcribe SOMETHING: the rules force an
    # opening timestamp then text — all-empty output was the round-2
    # state-machine regression
    assert segs
    for s in segs:
        assert set(s) == {"start", "end", "text", "tokens"}
        assert 0 <= s["start"] <= s["end"] <= 3 * CHUNK_S
        assert s["text"]


def test_from_hf_dir_roundtrip(tiny, tmp_path):
    """Checkpoint-dir loading (safetensors + config.json) reproduces the
    directly-converted model."""
    hf, cfg, enc_p, dec_p = tiny
    from safetensors.numpy import save_file

    d = tmp_path / "whisper-tiny-random"
    d.mkdir()
    (d / "config.json").write_text(hf.config.to_json_string())
    save_file(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()},
        str(d / "model.safetensors"),
    )

    class Tok:
        def decode(self, ids):
            return "x"

    asr = WhisperASR.from_hf_dir(str(d), tokenizer=Tok(), compute_dtype="float32")
    assert asr.cfg == cfg
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.normal(0, 1, (1, 3000, cfg.n_mels)).astype(np.float32))
    a = np.asarray(asr._encode(mel))
    b = np.asarray(WhisperEncoder(cfg).apply({"params": enc_p}, mel))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_text_extractor_uses_jax_asr(tiny, tmp_path, monkeypatch):
    """TextExtractor.transcribe(asr=...) routes through WhisperASR (no
    whisper/whisperx import) and caches the transcript JSON."""
    import json

    from repurpose_tpu.preprocessing.extract import TextExtractor

    _, cfg, enc_p, dec_p = tiny

    class Tok:
        def decode(self, ids):
            return " ".join(f"w{i}" for i in ids)

    asr = WhisperASR(cfg, enc_p, dec_p, Tok(), max_chunk_batch=2)
    rng = np.random.default_rng(8)
    wave = rng.normal(0, 0.1, 16000 * 4).astype(np.float32)
    monkeypatch.setattr(
        "repurpose_tpu.preprocessing.media.load_audio", lambda path, sr: wave
    )
    cache = tmp_path / "t.json"
    segs = TextExtractor.transcribe("fake.mp4", str(cache), asr=asr)
    assert cache.exists() and json.load(open(cache)) == segs
    for s in segs:
        assert set(s) == {"start", "end", "text", "tokens"}


def test_config_from_hf_large_v3_layout():
    """large-v3 / v3-turbo vocabs (51866) carry 100 language slots (<|yue|>
    added), shifting every special by one: transcribe=50360 (not 50359,
    which is <|translate|>), timestamps start at 50365 (review finding r3 —
    the 99-slot offsets would condition on TRANSLATE and misparse every
    timestamp)."""
    from transformers import WhisperConfig

    hf_cfg = WhisperConfig(
        vocab_size=51866, num_mel_bins=128, d_model=16, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=32, decoder_ffn_dim=32, max_source_positions=1500,
        max_target_positions=24,
    )
    cfg = config_from_hf(hf_cfg)
    assert cfg.eot == 50257 and cfg.sot == 50258
    assert cfg.n_langs == 100
    assert cfg.translate == 50359
    assert cfg.transcribe == 50360
    assert cfg.no_speech == 50363
    assert cfg.no_timestamps == 50364
    assert cfg.timestamp_begin == 50365
    from repurpose_tpu.extractors.whisper_jax import _suppress_mask

    m = _suppress_mask(cfg)
    # all 100 language slots incl. <|yue|> (50358), plus startoflm/startofprev
    assert m[50259] and m[50358] and m[50361] and m[50362]
    assert not m[cfg.timestamp_begin]

    # v2 layout (51865) unchanged: 99 slots, transcribe 50359, ts0 50364
    hf_v2 = WhisperConfig(
        vocab_size=51865, num_mel_bins=80, d_model=16, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=32, decoder_ffn_dim=32, max_source_positions=1500,
        max_target_positions=24,
    )
    v2 = config_from_hf(hf_v2)
    assert (v2.n_langs, v2.transcribe, v2.timestamp_begin) == (99, 50359, 50364)


def test_no_speech_gate(tiny, monkeypatch):
    """Opt-in silence gate: threshold 0 gates every chunk (P(nospeech) >= 0),
    None keeps current behavior; zero-length audio always returns []."""
    import repurpose_tpu.extractors.whisper_jax as wj

    _, cfg, enc_p, dec_p = tiny

    class Tok:
        def decode(self, ids):
            return "".join(f" w{i}" for i in ids)

    ts0 = cfg.timestamp_begin
    row = [cfg.sot, cfg.lang_begin, cfg.transcribe, ts0, 5, ts0 + 100, cfg.eot]

    def fake_decode(decoder, variables, enc, prompt, with_timestamps=True):
        out = np.full((enc.shape[0], cfg.max_target_positions), cfg.eot, np.int32)
        for j in range(enc.shape[0]):
            out[j, : len(row)] = row
        return jnp.asarray(out)

    monkeypatch.setattr(wj, "greedy_decode", fake_decode)
    rng = np.random.default_rng(5)
    wave = rng.normal(0, 0.1, 16000 * 3).astype(np.float32)

    asr = WhisperASR(cfg, enc_p, dec_p, Tok())
    assert asr.transcribe_wave(np.zeros(0, np.float32)) == []
    segs_open = asr.transcribe_wave(wave)
    assert segs_open  # ungated: the stubbed decode yields one segment

    gated = WhisperASR(cfg, enc_p, dec_p, Tok(), no_speech_threshold=0.0)
    assert gated.transcribe_wave(wave) == []
