"""Word-timestamp aligner tests (cross-attention DTW, whisper_align.py +
csrc/dtw.cc).

The capability target is the reference's WhisperX word alignment
(preprocessing/text_feature_extractor.py:129-160); the method under test is
whisper-style DTW over the ASR model's own cross-attention. Cross-attention
weights and the normalization chain validate against a randomly-initialized
HF Whisper decoder's ``output_attentions``."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from repurpose_tpu import native
from repurpose_tpu.extractors.whisper_align import (
    TIME_PER_POSITION,
    WhisperAligner,
    attach_words,
    default_alignment_heads,
    split_words,
    words_from_matrix,
)
from repurpose_tpu.extractors.whisper_jax import (
    CHUNK_S,
    WhisperASR,
    WhisperDecoder,
)


# -- DTW -----------------------------------------------------------------------------


def test_dtw_native_matches_fallback_and_is_valid():
    if not native.available():
        pytest.skip("no native library: dtw_path would fall back to "
                    "_dtw_numpy and compare it against itself")
    rng = np.random.default_rng(0)
    for _ in range(50):
        n, m = int(rng.integers(1, 25)), int(rng.integers(1, 35))
        cost = rng.normal(0, 1, (n, m)).astype(np.float32)
        ti, tj = native.dtw_path(cost)
        ti2, tj2 = native._dtw_numpy(cost)
        assert np.array_equal(ti, ti2) and np.array_equal(tj, tj2)
        # path validity: corner-to-corner, monotone unit steps
        assert (ti[0], tj[0]) == (0, 0) and (ti[-1], tj[-1]) == (n - 1, m - 1)
        di, dj = np.diff(ti), np.diff(tj)
        assert ((di >= 0) & (di <= 1) & (dj >= 0) & (dj <= 1) & (di + dj > 0)).all()


def test_dtw_prefers_low_cost_path():
    # cost 0 along the diagonal band, 1 elsewhere -> path sticks to the band
    n = m = 8
    cost = np.ones((n, m), np.float32)
    for i in range(n):
        cost[i, i] = 0.0
    ti, tj = native.dtw_path(cost)
    assert np.array_equal(ti, tj)  # pure diagonal


# -- word splitting / timing --------------------------------------------------------


VOCAB = {1: " hello", 2: " wor", 3: "ld", 4: "!", 5: " there"}


def _decode(ids):
    return "".join(VOCAB.get(i, "") for i in ids)


def test_split_words_groups_continuation_tokens():
    words = split_words([1, 2, 3, 4, 5], _decode)
    assert words == [("hello", 1), ("world!", 3), ("there", 1)]


def test_words_from_matrix_block_diagonal():
    """3 tokens + EOT row against 10 frames with unambiguous blocks: each
    word's start/end must land on its block boundaries (20 ms grid)."""
    spans = [(0, 3), (3, 6), (6, 8), (8, 10)]  # rows: tok0, tok1, tok2, eot
    matrix = np.full((4, 10), -5.0, np.float32)
    for r, (a, b) in enumerate(spans):
        matrix[r, a:b] = 5.0
    words = words_from_matrix(matrix, [1, 2, 3], lambda ids: _decode(ids), offset_s=0.0)
    # tokens 2,3 form one word ("world": " wor" + "ld")
    assert [w["word"] for w in words] == ["hello", "world"]
    assert words[0]["start"] == pytest.approx(0.0)
    assert words[0]["end"] == pytest.approx(3 * TIME_PER_POSITION)
    assert words[1]["start"] == pytest.approx(3 * TIME_PER_POSITION)
    assert words[1]["end"] == pytest.approx(8 * TIME_PER_POSITION)


def test_attach_words_by_token_budget():
    segments = [
        {"start": 0.0, "end": 2.0, "text": "hello", "tokens": [1]},
        {"start": 2.0, "end": 4.0, "text": "world! there", "tokens": [2, 3, 4, 5]},
    ]
    words = [
        {"word": "hello", "start": 0.1, "end": 0.5, "_n_tokens": 1},
        {"word": "world!", "start": 2.1, "end": 2.5, "_n_tokens": 3},
        {"word": "there", "start": 2.6, "end": 3.0, "_n_tokens": 1},
    ]
    attach_words(segments, words)
    assert [w["word"] for w in segments[0]["words"]] == ["hello"]
    assert [w["word"] for w in segments[1]["words"]] == ["world!", "there"]
    assert all("_n_tokens" not in w for s in segments for w in s["words"])


# -- alignment matrix parity vs HF cross-attentions ---------------------------------


def _medfilt_reflect(x: np.ndarray, width: int = 7) -> np.ndarray:
    half = width // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, half)], mode="reflect")
    stacked = np.stack(
        [xp[..., i : i + x.shape[-1]] for i in range(width)], axis=0
    )
    return np.median(stacked, axis=0)


def test_alignment_matrix_matches_hf_cross_attentions(tiny):  # noqa: F811
    hf, cfg, enc_p, dec_p = tiny
    rng = np.random.default_rng(11)
    b, l, s = 2, 10, cfg.max_source_positions
    enc = rng.normal(0, 1, (b, s, cfg.d_model)).astype(np.float32)
    toks = rng.integers(0, 1000, (b, l)).astype(np.int64)

    with torch.no_grad():
        out = hf.model.decoder(
            input_ids=torch.from_numpy(toks),
            encoder_hidden_states=torch.from_numpy(enc),
            output_attentions=True,
        )
    cross = [a.numpy() for a in out.cross_attentions]  # per layer [B, H, L, S]

    heads = default_alignment_heads(cfg)
    sel = np.stack([cross[layer][:, head] for layer, head in heads], axis=1)
    mean = sel.mean(axis=2, keepdims=True)
    std = sel.std(axis=2, keepdims=True)  # population std, matching the TPU op
    expected = _medfilt_reflect((sel - mean) / np.sqrt(std**2 + 1e-9)).mean(axis=1)

    dec = WhisperDecoder(cfg)
    head_w = np.zeros((cfg.dec_layers, cfg.heads), np.float32)
    for layer, head in heads:
        head_w[layer, head] = 1.0 / len(heads)
    got = np.asarray(
        dec.apply(
            {"params": dec_p},
            jnp.asarray(toks.astype(np.int32)),
            jnp.asarray(enc),
            jnp.ones((b, l), bool),
            jnp.ones((b, s), bool),
            jnp.asarray(head_w),
            method=WhisperDecoder.alignment_matrix,
        )
    )
    np.testing.assert_allclose(got, expected, atol=5e-3, rtol=1e-2)


def test_alignment_matrix_frame_mask_zeroes_tail(tiny):  # noqa: F811
    """Frames past the content length must get (numerically) zero attention
    before normalization — the masked softmax puts all mass on valid frames."""
    _, cfg, _, dec_p = tiny
    rng = np.random.default_rng(12)
    b, l, s = 1, 6, cfg.max_source_positions
    enc = jnp.asarray(rng.normal(0, 1, (b, s, cfg.d_model)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, 1000, (b, l)).astype(np.int32))
    frame_valid = np.zeros((b, s), bool)
    frame_valid[:, :100] = True
    head_w = np.full((cfg.dec_layers, cfg.heads), 1.0 / (cfg.dec_layers * cfg.heads), np.float32)
    dec = WhisperDecoder(cfg)
    got = np.asarray(
        dec.apply(
            {"params": dec_p}, toks, enc, jnp.ones((b, l), bool),
            jnp.asarray(frame_valid), jnp.asarray(head_w),
            method=WhisperDecoder.alignment_matrix,
        )
    )
    # masked frames carry no signal: every head's weight there is exactly 0,
    # so after standardization each column is the (identical) -mean/std value
    # and the matrix is constant across tokens — no DTW preference
    tail = got[0, :, 100:]
    assert np.allclose(tail, tail[0:1], atol=1e-5)


# -- end-to-end through WhisperASR ---------------------------------------------------


class _Tok:
    # byte-level-BPE-faithful fake: the word boundary lives INSIDE each
    # token's piece (whisper's "Ġ" prefix), so decoding any token slice is
    # the concatenation of per-token pieces — the property split_words'
    # unit-local decode relies on (openai split_tokens_on_unicode decodes
    # only the open unit's tokens the same way)
    def decode(self, ids):
        return "".join(f" w{i}" for i in ids)


def test_asr_word_timestamps_end_to_end(tiny, monkeypatch):  # noqa: F811
    """Full transcribe_wave glue with deterministic decodes: a random tiny
    model almost never emits <|t|> text <|t|> patterns, so greedy_decode is
    stubbed with crafted token rows; the ALIGNMENT itself (teacher-forced
    cross-attention + DTW) runs the real model end to end."""
    _, cfg, enc_p, dec_p = tiny
    import repurpose_tpu.extractors.whisper_jax as wj

    ts0 = cfg.timestamp_begin
    rows = [
        # chunk 0: two segments ([0.0-2.0] "w5 w6", [2.0-4.0] "w7")
        [cfg.sot, cfg.lang_begin, cfg.transcribe,
         ts0, 5, 6, ts0 + 100, ts0 + 100, 7, ts0 + 200, cfg.eot],
        # chunk 1: one segment ([0.4-1.0] "w8 w9")
        [cfg.sot, cfg.lang_begin, cfg.transcribe,
         ts0 + 20, 8, 9, ts0 + 50, cfg.eot],
        # chunk 2: silence
        [cfg.sot, cfg.lang_begin, cfg.transcribe, cfg.eot],
    ]
    calls = {"i": 0}

    def fake_decode(decoder, variables, enc, prompt, with_timestamps=True):
        b = enc.shape[0]
        out = np.full((b, cfg.max_target_positions), cfg.eot, np.int32)
        for j in range(b):
            r = rows[min(calls["i"] + j, len(rows) - 1)]
            out[j, : len(r)] = r
        calls["i"] += b
        return jnp.asarray(out)

    monkeypatch.setattr(wj, "greedy_decode", fake_decode)
    asr = WhisperASR(cfg, enc_p, dec_p, _Tok(), max_chunk_batch=2)
    rng = np.random.default_rng(13)
    wave = rng.normal(0, 0.1, int(16000 * 65.0)).astype(np.float32)
    segs = asr.transcribe_wave(wave, word_timestamps=True)
    assert [s["text"] for s in segs] == ["w5 w6", "w7", "w8 w9"]
    assert segs[2]["start"] == pytest.approx(CHUNK_S + 0.4)
    for seg in segs:
        assert "words" in seg and seg["words"]
        chunk_lo = (seg["start"] // CHUNK_S) * CHUNK_S
        for w in seg["words"]:
            assert w["start"] <= w["end"]
            assert chunk_lo <= w["start"] <= chunk_lo + CHUNK_S
            assert chunk_lo <= w["end"] <= chunk_lo + CHUNK_S
        # words reproduce the segment text (the dummy vocab is space-joined)
        assert " ".join(w["word"] for w in seg["words"]) == seg["text"]
        starts = [w["start"] for w in seg["words"]]
        assert starts == sorted(starts)


def test_aligner_handles_empty_rows(tiny):  # noqa: F811
    _, cfg, enc_p, dec_p = tiny
    dec = WhisperDecoder(cfg)
    aligner = WhisperAligner(dec, {"params": dec_p}, (cfg.sot,))
    rng = np.random.default_rng(14)
    enc = jnp.asarray(
        rng.normal(0, 1, (2, cfg.max_source_positions, cfg.d_model)).astype(np.float32)
    )
    mats = aligner.align_block([[5, 6, 7], []], enc, [480_000, 480_000])
    assert mats[0].shape[0] == 4  # 3 text rows + EOT
    assert mats[1].shape[0] == 1  # EOT row only
    assert words_from_matrix(mats[1], [], _decode) == []


def test_aligner_truncates_overlong_rows(tiny):  # noqa: F811
    """Rows longer than max_target_positions - prompt - 1 must truncate, not
    crash or mis-shape (448-token budget at full scale; 24 here)."""
    _, cfg, enc_p, dec_p = tiny
    dec = WhisperDecoder(cfg)
    aligner = WhisperAligner(dec, {"params": dec_p}, (cfg.sot,))
    rng = np.random.default_rng(15)
    enc = jnp.asarray(
        rng.normal(0, 1, (1, cfg.max_source_positions, cfg.d_model)).astype(np.float32)
    )
    long_row = list(range(5, 5 + 2 * cfg.max_target_positions))
    mats = aligner.align_block([long_row], enc, [480_000])
    budget = cfg.max_target_positions - len(aligner.prompt) - 1
    assert mats[0].shape[0] == budget + 1
    # words_from_matrix rejects a mismatched (tokens, rows) pair cleanly
    assert words_from_matrix(mats[0], long_row, lambda ids: "x") == []
    words = words_from_matrix(
        # concatenation-faithful fake (boundary space inside each piece)
        mats[0], long_row[:budget], lambda ids: "".join(f" {i}" for i in ids)
    )
    assert len(words) == budget


def test_word_level_binning():
    from repurpose_tpu.preprocessing.extract import bin_transcript_per_second

    segments = [
        {
            "start": 0.5, "end": 4.0, "text": "alpha beta gamma",
            "words": [
                {"word": "alpha", "start": 0.5, "end": 0.9},
                {"word": "beta", "start": 1.2, "end": 2.8},
                {"word": "gamma", "start": 3.1, "end": 3.4},
            ],
        }
    ]
    # segment-level (reference-exact): seconds 1..3 get the whole text
    seg_bins = bin_transcript_per_second(segments, 5)
    assert seg_bins == ["", "alpha beta gamma", "alpha beta gamma", "alpha beta gamma", ""]
    # word-level: each second gets only the words spoken during it
    word_bins = bin_transcript_per_second(segments, 5, word_level=True)
    assert word_bins == ["alpha", "beta", "beta", "gamma", ""]


def test_split_words_cjk_per_character():
    """Spaceless scripts split per decoded character (openai's
    split_tokens_on_unicode behavior for zh/ja): each ideogram is its own
    word even with no whitespace anywhere, and token counts still sum."""
    vocab = {1: "你", 2: "好", 3: "世", 4: "界", 5: " ok"}
    words = split_words([1, 2, 3, 4, 5], lambda ids: "".join(vocab[i] for i in ids))
    assert words == [("你", 1), ("好", 1), ("世", 1), ("界", 1), ("ok", 1)]


def test_split_words_multibyte_token_pieces():
    """A CJK char split across two byte-level tokens must stay ONE word of 2
    tokens (the partial piece decodes to U+FFFD and may not break)."""
    # token 1 -> first byte(s) of 好 (decodes alone to replacement char),
    # token 2 completes it; token 3 is another full char. split_words
    # decodes unit-locally, so the mapping covers the slices it asks for.
    full = {(1,): "�", (1, 2): "好", (3,): "了"}
    words = split_words([1, 2, 3], lambda ids: full[tuple(ids)])
    assert words == [("好", 2), ("了", 1)]


def test_split_words_thai_breaks_from_latin():
    vocab = {1: "hi", 2: "ไ", 3: "ป"}
    words = split_words([1, 2, 3], lambda ids: "".join(vocab[i] for i in ids))
    assert words == [("hi", 1), ("ไ", 1), ("ป", 1)]


# -- alignment-head resolution ------------------------------------------------------


def test_resolve_heads_generation_config_wins(tmp_path):
    import json

    from repurpose_tpu.extractors.whisper_align import resolve_alignment_heads

    d = tmp_path / "whisper-base"
    d.mkdir()
    (d / "generation_config.json").write_text(
        json.dumps({"alignment_heads": [[1, 2], [3, 4]]})
    )
    # the file wins over the name-matched bundled "base" table
    assert resolve_alignment_heads(path=str(d)) == [(1, 2), (3, 4)]


def test_resolve_heads_by_name_and_dims():
    from repurpose_tpu.extractors.whisper_align import (
        PUBLISHED_ALIGNMENT_HEADS,
        resolve_alignment_heads,
    )
    from repurpose_tpu.extractors.whisper_jax import WhisperJaxConfig

    assert resolve_alignment_heads(name="openai/whisper-small.en") == list(
        PUBLISHED_ALIGNMENT_HEADS["small.en"]
    )
    # bare "large" means v2 (openai's current alias)
    assert resolve_alignment_heads(name="whisper-large") == list(
        PUBLISHED_ALIGNMENT_HEADS["large-v2"]
    )
    # dims-only lookup (default config is whisper-base dims)
    assert resolve_alignment_heads(cfg=WhisperJaxConfig()) == list(
        PUBLISHED_ALIGNMENT_HEADS["base"]
    )
    # unknown checkpoint -> None -> caller falls back to top-half heads
    assert (
        resolve_alignment_heads(
            name="custom", cfg=WhisperJaxConfig(d_model=96, dec_layers=2)
        )
        is None
    )


def test_published_heads_are_in_range():
    from repurpose_tpu.extractors.whisper_align import (
        PUBLISHED_ALIGNMENT_HEADS,
        _DIMS_TO_NAME,
    )

    dims = {name: key for key, name in _DIMS_TO_NAME.items()}
    heads_per_model = {384: 6, 512: 8, 768: 12, 1024: 16, 1280: 20}
    for name, pairs in PUBLISHED_ALIGNMENT_HEADS.items():
        key = dims.get(name)
        if key is None:  # large-v1 shares large-v2 dims
            key = dims["large-v2"]
        d_model, layers, _, _ = key
        n_heads = heads_per_model[d_model]
        for layer, head in pairs:
            assert 0 <= layer < layers, (name, layer)
            assert 0 <= head < n_heads, (name, head)


def test_aligner_uses_given_heads(tiny):
    """WhisperAligner's head-weight matrix is nonzero exactly at the supplied
    pairs (so a published dump actually drives the similarity matrix)."""
    _, cfg, _, dec_p = tiny
    dec = WhisperDecoder(cfg, compute_dtype="float32")
    aligner = WhisperAligner(
        dec, {"params": dec_p}, prompt=(cfg.sot,), alignment_heads=[(0, 1), (1, 0)]
    )
    w = np.asarray(aligner._head_w)
    assert w[0, 1] > 0 and w[1, 0] > 0
    assert np.isclose(w.sum(), 1.0)
    assert (w > 0).sum() == 2


def test_resolve_heads_rejects_architecture_mismatch():
    """A distil-whisper-like checkpoint (name matches 'large-v3' but only 2
    decoder layers) must NOT get the published large-v3 heads — indexing
    (7, 0) on a 2-layer weight matrix would crash the aligner; expect None
    (top-half-heads fallback)."""
    from repurpose_tpu.extractors.whisper_align import resolve_alignment_heads
    from repurpose_tpu.extractors.whisper_jax import WhisperJaxConfig

    distil = WhisperJaxConfig(d_model=1280, dec_layers=2, heads=20,
                              vocab_size=51866, n_mels=128)
    assert resolve_alignment_heads(name="distil-large-v3", cfg=distil) is None
    # with matching dims the same name resolves normally
    real = WhisperJaxConfig(d_model=1280, enc_layers=32, dec_layers=32,
                            heads=20, vocab_size=51866, n_mels=128)
    assert resolve_alignment_heads(name="whisper-large-v3", cfg=real) is not None


def test_resolve_heads_name_dims_consistency(tmp_path):
    """A directory NAME that contradicts the checkpoint's actual dims must
    lose to the dims lookup (e.g. large-v3 weights in a '...-large' dir:
    v2's heads fit v3's 32x20 architecture, so _fits alone can't catch it);
    and a non-object generation_config.json must fall through, not crash."""
    import json

    from repurpose_tpu.extractors.whisper_align import (
        PUBLISHED_ALIGNMENT_HEADS,
        resolve_alignment_heads,
    )
    from repurpose_tpu.extractors.whisper_jax import WhisperJaxConfig

    v3 = WhisperJaxConfig(
        d_model=1280, enc_layers=32, dec_layers=32, heads=20,
        vocab_size=51866, n_mels=128,
    )
    got = resolve_alignment_heads(name="openai/whisper-large", cfg=v3)
    assert got == list(PUBLISHED_ALIGNMENT_HEADS["large-v3"])
    # name consistent with dims still resolves by name (large-v1 vs v2
    # share dims — the name is the only signal)
    v1 = WhisperJaxConfig(
        d_model=1280, enc_layers=32, dec_layers=32, heads=20,
        vocab_size=51865, n_mels=80,
    )
    got = resolve_alignment_heads(name="whisper-large-v1", cfg=v1)
    assert got == list(PUBLISHED_ALIGNMENT_HEADS["large-v1"])
    # corrupted generation_config (valid JSON, wrong type) falls through
    d = tmp_path / "ckpt-small"
    d.mkdir()
    (d / "generation_config.json").write_text(json.dumps(["oops"]))
    got = resolve_alignment_heads(path=str(d))
    assert got == list(PUBLISHED_ALIGNMENT_HEADS["small"])


def test_split_words_supplementary_plane_cjk():
    """Ideographs beyond the BMP (CJK ext B+, e.g. U+20BB7) still split per
    token-run seam instead of merging into one multi-character word."""
    from repurpose_tpu.extractors.whisper_align import split_words

    pieces = {1: "\U00020BB7", 2: "\U00020BB7", 3: "好"}

    def decode(toks):
        return "".join(pieces[t] for t in toks)

    words = split_words([1, 2, 3], decode)
    assert words == [("\U00020BB7", 1), ("\U00020BB7", 1), ("好", 1)]
