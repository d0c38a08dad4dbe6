"""Whisper ASR on TPU, in Flax — encoder, KV-cached decoder, timestamp-aware
greedy decoding, log-mel frontend, and an HF weight converter.

The reference transcribes host-side with WhisperX/whisper on GPU
(preprocessing/text_feature_extractor.py:129-160) and this repo's default ASR
path does the same (preprocessing/extract.py). This module is the ROADMAP
"Whisper on TPU" capability: the full transcription loop — 30 s chunk
log-mels, encoder, and a batched greedy decode with OpenAI's timestamp rules
— runs as jitted TPU programs, so the all-TPU preprocessing pipeline needs no
torch at inference time. Weights convert from any HF Whisper checkpoint
(openai/whisper-{tiny..large}); token ids default to the multilingual vocab
layout.

TPU-first design notes:
- the decoder decodes ALL 30 s chunks of a video as one batch (the reference
  decodes sequentially, one window at a time);
- the greedy loop is a `lax.while_loop` with per-row done flags, a
  preallocated KV cache, and EARLY EXIT once every row finishes (decode cost
  tracks the longest transcript, not the 448-token budget) — one compiled
  program per (batch, prompt-length) shape, no dynamic shapes;
- ``beam_decode`` folds the beam dimension into the batch through the same
  KV-cached step (one top_k per iteration, KV gathers along back-pointers) —
  the TPU equivalent of the reference host path's beam-5 default;
- timestamp logit rules (pairing, monotonicity, the sum-probability rule,
  the initial-timestamp cap) are vectorized over the batch inside the loop;
- ``detect_language`` is one extra decoder step over the language-token slice.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from repurpose_tpu.extractors.audio_frontend import mel_filterbank, stft_power

Array = jax.Array

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
N_MELS = 80
CHUNK_S = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_S  # 480_000
N_FRAMES = N_SAMPLES // HOP  # 3000
TIME_PER_TOKEN = 0.02  # one timestamp token = 20 ms


@dataclass(frozen=True)
class WhisperJaxConfig:
    """Dims follow HF WhisperConfig; defaults are whisper-base. Token ids are
    the multilingual layout (vocab 51865); English-only checkpoints override.
    """

    vocab_size: int = 51865
    n_mels: int = N_MELS
    d_model: int = 512
    enc_layers: int = 6
    dec_layers: int = 6
    heads: int = 8
    d_ff: int = 2048
    max_source_positions: int = 1500
    max_target_positions: int = 448
    # special tokens (multilingual vocab layout)
    eot: int = 50257
    sot: int = 50258
    lang_begin: int = 50259  # <|en|>; 99 language tokens follow
    n_langs: int = 99
    translate: int = 50358
    transcribe: int = 50359
    no_speech: int = 50362
    no_timestamps: int = 50363
    timestamp_begin: int = 50364  # <|0.00|>
    max_initial_timestamp_index: int = 50  # 1.0 s (openai decoding default)

    @property
    def d_head(self) -> int:
        return self.d_model // self.heads


def _attn(
    q: Array, k: Array, v: Array, bias: Array | None, heads: int,
    return_weights: bool = False,
):
    """[B,T,d] q/k/v (already projected) -> [B,Tq,d]; HF Whisper scales q by
    d_head**-0.5 at projection time, so no scale here. With
    ``return_weights`` also returns the float32 softmax weights [B,H,Tq,Tk]
    (the word-aligner's signal, whisper_align.py)."""
    b, tq, d = q.shape
    dh = d // heads
    qh = q.reshape(b, tq, heads, dh)
    kh = k.reshape(b, k.shape[1], heads, dh)
    vh = v.reshape(b, v.shape[1], heads, dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias
    w = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), vh).reshape(b, tq, d)
    if return_weights:
        return out, w
    return out


class _EncLayer(nn.Module):
    cfg: WhisperJaxConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        d = cfg.d_model
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="self_ln")(x).astype(x.dtype)
        q = nn.Dense(d, dtype=x.dtype, name="q")(h) * (cfg.d_head**-0.5)
        k = nn.Dense(d, use_bias=False, dtype=x.dtype, name="k")(h)
        v = nn.Dense(d, dtype=x.dtype, name="v")(h)
        x = x + nn.Dense(d, dtype=x.dtype, name="attn_out")(
            _attn(q, k, v, None, cfg.heads)
        )
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_ln")(x).astype(x.dtype)
        h = nn.Dense(cfg.d_ff, dtype=x.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(d, dtype=x.dtype, name="fc2")(h)


class WhisperEncoder(nn.Module):
    """log-mel [B, T=3000, n_mels] -> audio states [B, 1500, d]."""

    cfg: WhisperJaxConfig = WhisperJaxConfig()
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, mel: Array) -> Array:
        cfg = self.cfg
        dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        x = mel.astype(dtype)
        x = nn.Conv(cfg.d_model, (3,), padding=1, dtype=dtype, name="conv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(cfg.d_model, (3,), strides=2, padding=1, dtype=dtype, name="conv2")(x)
        x = jax.nn.gelu(x, approximate=False)  # [B, 1500, d]
        pos = self.param(
            "pos_embed",
            lambda _key, shape: jnp.asarray(_sinusoids(*shape)),
            (cfg.max_source_positions, cfg.d_model),
        )
        x = x + pos[: x.shape[1]].astype(dtype)
        for i in range(cfg.enc_layers):
            x = _EncLayer(cfg, name=f"layer_{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(x).astype(dtype)


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed encoder position signal (openai whisper/model.py)."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


class _DecLayer(nn.Module):
    cfg: WhisperJaxConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        d = cfg.d_model
        # dtype on every Dense: without it flax promotes to the float32 param
        # dtype, which breaks the bf16 KV cache (dynamic_update_slice requires
        # matching dtypes) and silently doubles the decode's compute width
        dt = self.dtype
        self.self_ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="self_ln")
        self.sq = nn.Dense(d, dtype=dt, name="sq")
        self.sk = nn.Dense(d, use_bias=False, dtype=dt, name="sk")
        self.sv = nn.Dense(d, dtype=dt, name="sv")
        self.s_out = nn.Dense(d, dtype=dt, name="s_out")
        self.cross_ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="cross_ln")
        self.cq = nn.Dense(d, dtype=dt, name="cq")
        self.ck = nn.Dense(d, use_bias=False, dtype=dt, name="ck")
        self.cv = nn.Dense(d, dtype=dt, name="cv")
        self.c_out = nn.Dense(d, dtype=dt, name="c_out")
        self.final_ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_ln")
        self.fc1 = nn.Dense(cfg.d_ff, dtype=dt, name="fc1")
        self.fc2 = nn.Dense(d, dtype=dt, name="fc2")

    def cross_kv(self, enc: Array) -> tuple[Array, Array]:
        return self.ck(enc), self.cv(enc)

    def __call__(
        self,
        x: Array,
        enc: Array,
        causal_bias: Array,
        cross_bias: Array | None = None,
        return_cross_weights: bool = False,
    ):
        cfg = self.cfg
        h = self.self_ln(x).astype(x.dtype)
        q = self.sq(h) * (cfg.d_head**-0.5)
        x = x + self.s_out(_attn(q, self.sk(h), self.sv(h), causal_bias, cfg.heads))
        h = self.cross_ln(x).astype(x.dtype)
        q = self.cq(h) * (cfg.d_head**-0.5)
        ck, cv = self.cross_kv(enc)
        if return_cross_weights:
            attn_out, w = _attn(q, ck, cv, cross_bias, cfg.heads, return_weights=True)
            x = x + self.c_out(attn_out)
        else:
            w = None
            x = x + self.c_out(_attn(q, ck, cv, cross_bias, cfg.heads))
        h = self.final_ln(x).astype(x.dtype)
        x = x + self.fc2(jax.nn.gelu(self.fc1(h), approximate=False))
        return (x, w) if return_cross_weights else x

    def step(
        self,
        x: Array,  # [B, 1, d] current position's hidden state
        pos: Array,  # scalar int32
        k_cache: Array,  # [B, L, d]
        v_cache: Array,
        ck: Array,  # [B, S, d] precomputed cross K
        cv: Array,
    ) -> tuple[Array, Array, Array]:
        cfg = self.cfg
        h = self.self_ln(x).astype(x.dtype)
        q = self.sq(h) * (cfg.d_head**-0.5)
        k_cache = jax.lax.dynamic_update_slice(k_cache, self.sk(h), (0, pos, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, self.sv(h), (0, pos, 0))
        # positions > pos hold zeros; mask them (also masks nothing at pos=L-1)
        valid = jnp.arange(k_cache.shape[1])[None, None, None, :] <= pos
        bias = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)
        x = x + self.s_out(_attn(q, k_cache, v_cache, bias, cfg.heads))
        h = self.cross_ln(x).astype(x.dtype)
        q = self.cq(h) * (cfg.d_head**-0.5)
        x = x + self.c_out(_attn(q, ck, cv, None, cfg.heads))
        h = self.final_ln(x).astype(x.dtype)
        return x + self.fc2(jax.nn.gelu(self.fc1(h), approximate=False)), k_cache, v_cache


class WhisperDecoder(nn.Module):
    """Teacher-forced forward (__call__) plus cached single-step decode
    (precompute_cross / step) for the greedy loop."""

    cfg: WhisperJaxConfig = WhisperJaxConfig()
    compute_dtype: str = "float32"

    def setup(self):
        cfg = self.cfg
        self.tok_embed = self.param(
            "tok_embed", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.d_model),
            jnp.float32,
        )
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (cfg.max_target_positions, cfg.d_model), jnp.float32,
        )
        self.layers = [
            _DecLayer(cfg, dtype=self._dtype, name=f"layer_{i}")
            for i in range(cfg.dec_layers)
        ]
        self.ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def __call__(self, tokens: Array, enc: Array) -> Array:
        """tokens [B, L] int32, enc [B, S, d] -> logits [B, L, vocab]."""
        b, l = tokens.shape
        x = (self.tok_embed[tokens] + self.pos_embed[:l][None]).astype(self._dtype)
        causal = jnp.tril(jnp.ones((l, l), bool))
        bias = jnp.where(causal, 0.0, -1e9).astype(jnp.float32)[None, None]
        enc = enc.astype(self._dtype)
        for layer in self.layers:
            x = layer(x, enc, bias)
        x = self.ln(x)
        return jnp.einsum(
            "bld,vd->blv", x, self.tok_embed, preferred_element_type=jnp.float32
        )

    def precompute_cross(self, enc: Array) -> list[tuple[Array, Array]]:
        enc = enc.astype(self._dtype)
        return [layer.cross_kv(enc) for layer in self.layers]

    def alignment_matrix(
        self,
        tokens: Array,  # [B, L] int32 (prompt + text + eot, padded with eot)
        enc: Array,  # [B, S, d]
        token_valid: Array,  # [B, L] bool: real (non-padding) token rows
        frame_valid: Array,  # [B, S] bool: encoder positions with audio content
        head_w: Array,  # [layers, heads] float32 head-selection weights (sum 1)
    ) -> Array:
        """Teacher-forced pass -> [B, L, S] float32 token/frame alignment
        similarity (the word aligner's DTW input, whisper_align.py).

        Per selected cross-attention head: softmax over the content frames,
        standardize each frame column over the real token rows (zero mean,
        unit variance — population std), median-filter (width 7, reflect)
        along frames, then average heads with ``head_w``. This is the signal
        openai-whisper's timing module extracts with forward hooks; here it is
        one jitted program, computed layer-by-layer so at most one [B,H,L,S]
        weight tensor is live."""
        b, l = tokens.shape
        x = (self.tok_embed[tokens] + self.pos_embed[:l][None]).astype(self._dtype)
        causal = jnp.tril(jnp.ones((l, l), bool))
        bias = jnp.where(causal, 0.0, -1e9).astype(jnp.float32)[None, None]
        enc = enc.astype(self._dtype)
        fbias = jnp.where(frame_valid, 0.0, -1e9).astype(jnp.float32)[:, None, None, :]
        tmask = token_valid.astype(jnp.float32)[:, None, :, None]  # [B,1,L,1]
        denom = jnp.maximum(jnp.sum(tmask, axis=2, keepdims=True), 1.0)
        acc = jnp.zeros((b, l, enc.shape[1]), jnp.float32)
        for li, layer in enumerate(self.layers):
            x, w = layer(x, enc, bias, cross_bias=fbias, return_cross_weights=True)
            mean = jnp.sum(w * tmask, axis=2, keepdims=True) / denom
            var = jnp.sum(jnp.square(w - mean) * tmask, axis=2, keepdims=True) / denom
            wn = (w - mean) * jax.lax.rsqrt(var + 1e-9)
            wn = _median_filter_last(wn, 7)
            acc = acc + jnp.einsum("bhls,h->bls", wn, head_w[li])
        return acc

    def step(
        self, token: Array, pos: Array, self_kv: tuple[Array, Array], cross_kv
    ) -> tuple[Array, tuple[Array, Array]]:
        """token [B] int32 at position ``pos``; self_kv k/v [B, layers, L, d].
        Returns (logits [B, vocab], updated self_kv)."""
        k_all, v_all = self_kv
        x = (self.tok_embed[token] + self.pos_embed[pos])[:, None, :].astype(self._dtype)
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x, k, v = layer.step(
                x, pos, k_all[:, i], v_all[:, i], cross_kv[i][0], cross_kv[i][1]
            )
            new_k.append(k)
            new_v.append(v)
        x = self.ln(x)
        logits = jnp.einsum(
            "bld,vd->blv", x, self.tok_embed, preferred_element_type=jnp.float32
        )[:, 0]
        return logits, (jnp.stack(new_k, 1), jnp.stack(new_v, 1))


def _median_filter_last(x: Array, width: int) -> Array:
    """Sliding median over the last axis, reflect-padded (matches the
    median_filter in openai-whisper's timing module)."""
    half = width // 2
    if x.shape[-1] <= half:
        return x
    xp = jnp.concatenate(
        [x[..., 1 : half + 1][..., ::-1], x, x[..., -half - 1 : -1][..., ::-1]],
        axis=-1,
    )
    stacked = jnp.stack(
        [xp[..., i : i + x.shape[-1]] for i in range(width)], axis=0
    )
    return jnp.median(stacked, axis=0)


# -- timestamp-aware greedy decoding ------------------------------------------------


def _suppress_mask(cfg: WhisperJaxConfig) -> np.ndarray:
    """Tokens never emitted during transcription: specials + language tags
    (openai SuppressBlank/SuppressTokens cover more vocabulary-specific ids;
    the structural ones matter for segment extraction)."""
    m = np.zeros(cfg.vocab_size, bool)
    ids = [
        cfg.sot, cfg.translate, cfg.transcribe, cfg.no_speech,
        cfg.no_timestamps,
        # <|startoflm|> / <|startofprev|> — openai's default suppress list
        # always includes them (decoding.py _get_suppress_tokens)
        cfg.translate + 2, cfg.translate + 3,
    ]
    m[[i for i in ids if i < cfg.vocab_size]] = True
    # every language-tag slot up to <|translate|> (99 or, on large-v3
    # vocabs, 100 slots — they exist in BOTH prompting layouts; n_langs=0
    # only marks English-only prompting) — always suppress them
    m[cfg.lang_begin : min(cfg.translate, cfg.vocab_size)] = True
    return m


def _apply_timestamp_rules(
    logits: Array,  # [B, V] float32
    last_tok: Array,  # [B] previous emitted token
    penult_tok: Array,  # [B] token before that
    max_ts: Array,  # [B] highest timestamp token emitted so far
    has_ts: Array,  # [B] any timestamp emitted yet
    is_first: Array,  # scalar bool: first sampled position
    cfg: WhisperJaxConfig,
    suppress: Array,  # [V] bool
) -> Array:
    """OpenAI ApplyTimestampRules (whisper/decoding.py), vectorized."""
    v = cfg.vocab_size
    ts0 = cfg.timestamp_begin
    ids = jnp.arange(v)
    is_ts = ids >= ts0
    neg = jnp.float32(-1e9)

    logits = jnp.where(suppress[None], neg, logits)

    last_is_ts = last_tok >= ts0
    penult_is_ts = penult_tok >= ts0
    # after the first of a timestamp pair: only a timestamp (or EOT) may follow
    force_ts = last_is_ts & ~penult_is_ts
    block_text = force_ts[:, None] & ~is_ts[None] & (ids != cfg.eot)[None]
    # after a completed pair: next must be text (no third timestamp)
    block_ts_pair = (last_is_ts & penult_is_ts)[:, None] & is_ts[None]
    # monotonicity (openai: timestamp_last): when pairing — last token is a
    # segment-closing timestamp, next is its pair-opener — equality with the
    # running max is allowed; everywhere else the next timestamp must be
    # STRICTLY greater (a segment may not end at its own start, openai's
    # "prevent infinite looping" constraint)
    thresh = jnp.where(has_ts, jnp.where(force_ts, max_ts, max_ts + 1), ts0)
    block_ts_low = is_ts[None] & (ids[None] < thresh[:, None])
    logits = jnp.where(block_text | block_ts_pair | block_ts_low, neg, logits)

    # first sampled token must be a timestamp <= max_initial_timestamp
    # (openai masks EVERYTHING below timestamp_begin here, EOT included —
    # a chunk always opens with a timestamp)
    cap = ts0 + cfg.max_initial_timestamp_index
    first_block = ~is_ts[None] | (ids[None] > cap)
    logits = jnp.where(is_first & first_block, neg, logits)

    # sum-probability rule: if p(any timestamp) > max p(text), force a timestamp
    logp = jax.nn.log_softmax(logits, axis=-1)
    ts_logp = jax.nn.logsumexp(jnp.where(is_ts[None], logp, neg), axis=-1)
    max_text = jnp.max(jnp.where(is_ts[None], neg, logp), axis=-1)
    force = (ts_logp > max_text)[:, None] & ~is_ts[None]
    return jnp.where(force, neg, logits)


def _rules_for_position(
    logits: Array,  # [N, V]
    tokens: Array,  # [N, L] current sequences (prompt + sampled + EOT pad)
    pos: Array,  # scalar int32 — position whose prediction `logits` is
    p: int,  # prompt length
    cfg: WhisperJaxConfig,
    suppress: Array,
) -> Array:
    """Timestamp rules for the prediction made at ``pos``.

    openai's rules look at the SAMPLED sequence only (seq =
    tokens[sample_begin:]): with no sampled token yet the "last" slot reads
    as non-timestamp, and with fewer than TWO sampled tokens the
    "penultimate" slot reads as timestamp (decoding.py ApplyTimestampRules:
    len(seq) < 2 clause). Feeding prompt tokens into those slots mispairs the
    state machine — the first sampled timestamp then looks like a segment
    CLOSER, text gets blocked, and every transcription decodes to empty-text
    timestamp pairs."""
    l = tokens.shape[1]
    emitted_ts = (tokens >= cfg.timestamp_begin) & (
        jnp.arange(l)[None] >= p
    ) & (jnp.arange(l)[None] <= pos)
    return _apply_timestamp_rules(
        logits,
        jnp.where(pos >= p, tokens[:, pos], cfg.sot),
        jnp.where(
            pos >= p + 1,
            tokens[:, jnp.maximum(pos - 1, 0)],
            cfg.timestamp_begin,  # len(seq) < 2 reads as timestamp
        ),
        jnp.max(jnp.where(emitted_ts, tokens, cfg.timestamp_begin), axis=1),
        jnp.any(emitted_ts, axis=1),
        jnp.asarray(pos == p - 1),
        cfg,
        suppress,
    )


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def greedy_decode(
    decoder: WhisperDecoder,
    variables: Mapping[str, Any],
    enc: Array,  # [B, S, d]
    prompt: tuple[int, ...],  # same prompt for every row, e.g. (sot, lang, task)
    with_timestamps: bool = True,
) -> Array:
    """Batched greedy decode -> tokens [B, max_target_positions] (prompt
    included; rows padded with EOT after their end)."""
    cfg = decoder.cfg
    b = enc.shape[0]
    l = cfg.max_target_positions
    p = len(prompt)
    prompt_arr = jnp.asarray(prompt, jnp.int32)
    suppress = jnp.asarray(_suppress_mask(cfg))

    cross_kv = decoder.apply(variables, enc, method=WhisperDecoder.precompute_cross)
    d = cfg.d_model
    self_kv = (
        jnp.zeros((b, cfg.dec_layers, l, d), enc.dtype),
        jnp.zeros((b, cfg.dec_layers, l, d), enc.dtype),
    )

    def body(carry):
        tokens, self_kv, done, pos = carry
        tok_in = tokens[:, pos]
        logits, self_kv = decoder.apply(
            variables, tok_in, pos, self_kv, cross_kv, method=WhisperDecoder.step
        )
        if with_timestamps:
            logits = _rules_for_position(logits, tokens, pos, p, cfg, suppress)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.eot, nxt)
        # predictions at prompt-feeding positions are discarded below, so an
        # EOT argmax there must not terminate the row
        done = done | ((nxt == cfg.eot) & (pos + 1 >= p))
        # write the sampled token at pos+1 unless it's still prompt territory
        in_prompt = pos + 1 < p
        write = jnp.where(in_prompt, tokens[:, jnp.minimum(pos + 1, l - 1)], nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, write[:, None], (0, pos + 1))
        return (tokens, self_kv, done, pos + 1)

    def cond(carry):
        _, _, done, pos = carry
        # early exit once every row has hit EOT: the scan-over-448-positions
        # formulation paid the full budget even for short transcripts —
        # decode cost now tracks the LONGEST transcript in the batch
        return (pos < l - 1) & ~jnp.all(done)

    tokens0 = jnp.full((b, l), cfg.eot, jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(
        tokens0, jnp.tile(prompt_arr[None], (b, 1)), (0, 0)
    )
    done0 = jnp.zeros((b,), bool)
    tokens, _, _, _ = jax.lax.while_loop(
        cond, body, (tokens0, self_kv, done0, jnp.int32(0))
    )
    return tokens


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def beam_decode(
    decoder: WhisperDecoder,
    variables: Mapping[str, Any],
    enc: Array,  # [B, S, d]
    prompt: tuple[int, ...],
    beam_size: int = 5,
    with_timestamps: bool = True,
) -> Array:
    """Batched beam search -> best tokens [B, max_target_positions].

    The reference's host ASR (whisperx / faster-whisper) decodes with beam 5;
    this is the TPU equivalent, designed for XLA: the beam dimension is
    FOLDED INTO THE BATCH ([B*W] rows through the same KV-cached step as
    greedy_decode); each iteration extends every live hypothesis, takes the
    top-2W of the W*V candidates per element (one `lax.top_k`), refills the
    beam with the best W non-EOT candidates, moves EOT candidates ranked
    above the W-th live one into a first-come finished pool capped at W
    (openai BeamSearchDecoder's exact bookkeeping), and gathers tokens + KV
    caches along the winning back-pointers. The final pick maximizes
    score / sampled-length-excluding-EOT (openai's MaximumLikelihoodRanker
    default). Early-exits once every element has W finished hypotheses;
    oracle-tested token-for-token (tests/test_whisper_beam.py)."""
    cfg = decoder.cfg
    b = enc.shape[0]
    w = beam_size
    v = cfg.vocab_size
    l = cfg.max_target_positions
    p = len(prompt)
    prompt_arr = jnp.asarray(prompt, jnp.int32)
    suppress = jnp.asarray(_suppress_mask(cfg))
    neg = jnp.float32(-1e9)

    enc_t = jnp.repeat(enc, w, axis=0)  # [B*W, S, d], beam-minor
    cross_kv = decoder.apply(variables, enc_t, method=WhisperDecoder.precompute_cross)
    d = cfg.d_model
    self_kv = (
        jnp.zeros((b * w, cfg.dec_layers, l, d), enc.dtype),
        jnp.zeros((b * w, cfg.dec_layers, l, d), enc.dtype),
    )
    tokens0 = jnp.full((b * w, l), cfg.eot, jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(
        tokens0, jnp.tile(prompt_arr[None], (b * w, 1)), (0, 0)
    )
    # only beam 0 is live at the first sampling step (all beams are identical
    # copies until then — without this the top-W would be W duplicates)
    scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros(1), jnp.full(w - 1, neg)]).astype(jnp.float32)[None],
        (b, 1),
    )
    # finished pool (openai: a hypothesis that emits EOT LEAVES the beam; the
    # beam refills with W live candidates). First-come capped at W entries,
    # in candidate-score order within a step — exactly BeamSearchDecoder's
    # previously_finished bookkeeping.
    fin_scores0 = jnp.full((b, w), neg)
    fin_tokens0 = jnp.full((b, w, l), cfg.eot, jnp.int32)
    fin_lengths0 = jnp.ones((b, w), jnp.float32)
    fin_count0 = jnp.zeros((b,), jnp.int32)

    def gather_beams(x, src):
        xr = x.reshape(b, w, *x.shape[1:])
        idx = src.reshape(b, w, *([1] * (len(x.shape) - 1)))
        return jnp.take_along_axis(xr, idx, axis=1).reshape(x.shape)

    def body(carry):
        (tokens, self_kv, scores, fin_scores, fin_tokens, fin_lengths,
         fin_count, pos) = carry
        tok_in = tokens[:, pos]
        logits, self_kv = decoder.apply(
            variables, tok_in, pos, self_kv, cross_kv, method=WhisperDecoder.step
        )
        if with_timestamps:
            logits = _rules_for_position(logits, tokens, pos, p, cfg, suppress)
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, w, v)
        cand = scores[:, :, None] + logp
        # top 2W of W*V covers both the W live refills and every EOT
        # candidate ranked above the W-th live one (openai scans candidates
        # in score order and stops collecting at W live)
        k2 = min(2 * w, v)
        top_s, top_i = jax.lax.top_k(cand.reshape(b, w * v), k2)
        src = (top_i // v).astype(jnp.int32)
        tok = (top_i % v).astype(jnp.int32)
        is_eot = tok == cfg.eot

        # live refill: best W non-EOT candidates
        live_s = jnp.where(is_eot, neg, top_s)
        lsel_s, lsel_i = jax.lax.top_k(live_s, w)  # indices into the k2
        live_src = jnp.take_along_axis(src, lsel_i, axis=1)
        live_tok = jnp.take_along_axis(tok, lsel_i, axis=1)

        in_prompt = pos + 1 < p
        # prompt phase: all beams identical — no reshuffle, no scoring
        live_src = jnp.where(
            in_prompt, jnp.arange(w, dtype=jnp.int32)[None], live_src
        )
        new_scores = jnp.where(in_prompt, scores, lsel_s)

        # finished candidates: EOT extensions ranked at/above the W-th live
        # candidate (the ones openai's scan reaches before its break)
        wth = lsel_s[:, w - 1 : w]
        fin_cand_s = jnp.where(is_eot & (top_s >= wth) & ~in_prompt, top_s, neg)
        # candidate-score order (top_s is already sorted, so fin_cand_s is
        # sorted among its valid entries after this top_k)
        fsel_s, fsel_i = jax.lax.top_k(fin_cand_s, k2)
        fin_cand_src = jnp.take_along_axis(src, fsel_i, axis=1)
        # build the finished sequences: source tokens + EOT at pos+1
        cand_tokens = jnp.take_along_axis(
            tokens.reshape(b, w, l), fin_cand_src[:, :, None], axis=1
        )  # [B, k2, L] (rows beyond the valid prefix are junk, never admitted)
        cand_tokens = jax.lax.dynamic_update_slice(
            cand_tokens, jnp.full((b, k2, 1), cfg.eot, jnp.int32), (0, 0, pos + 1)
        )
        # first-come fill: slot j takes new candidate j - fin_count while
        # slots remain and the candidate is valid; existing entries are never
        # evicted (openai caps, it does not re-rank)
        j = jnp.arange(w, dtype=jnp.int32)[None]
        new_idx = jnp.clip(j - fin_count[:, None], 0, k2 - 1)
        incoming_s = jnp.take_along_axis(fsel_s, new_idx, axis=1)
        take_new = (j >= fin_count[:, None]) & (incoming_s > neg / 2)
        fin_scores = jnp.where(take_new, incoming_s, fin_scores)
        incoming_tokens = jnp.take_along_axis(
            cand_tokens, new_idx[:, :, None], axis=1
        )
        fin_tokens = jnp.where(take_new[:, :, None], incoming_tokens, fin_tokens)
        # openai's ranker length EXCLUDES the EOT token
        n_sampled = jnp.float32(pos + 1 - p)
        fin_lengths = jnp.where(
            take_new, jnp.maximum(n_sampled, 1.0), fin_lengths
        )
        n_new = jnp.sum(fsel_s > neg / 2, axis=1).astype(jnp.int32)
        fin_count = jnp.minimum(fin_count + n_new, w)

        tokens = gather_beams(tokens, live_src)
        self_kv = (
            gather_beams(self_kv[0], live_src),
            gather_beams(self_kv[1], live_src),
        )
        tok_flat = live_tok.reshape(b * w)
        write = jnp.where(
            in_prompt, tokens[:, jnp.minimum(pos + 1, l - 1)], tok_flat
        )
        tokens = jax.lax.dynamic_update_slice(tokens, write[:, None], (0, pos + 1))
        return (tokens, self_kv, new_scores, fin_scores, fin_tokens,
                fin_lengths, fin_count, pos + 1)

    def cond(carry):
        fin_count = carry[6]
        pos = carry[7]
        # stop when every element has collected W finished hypotheses
        return (pos < l - 1) & ~jnp.all(fin_count >= w)

    (tokens, _, scores, fin_scores, fin_tokens, fin_lengths, fin_count, _) = (
        jax.lax.while_loop(
            cond, body,
            (tokens0, self_kv, scores0, fin_scores0, fin_tokens0,
             fin_lengths0, fin_count0, jnp.int32(0)),
        )
    )
    # finalize: openai pads the finished pool with the BEST LIVE hypotheses
    # until it holds W entries whenever fin_count < W (BeamSearchDecoder.
    # finalize), then ranks score/length over all W. At budget exhaustion
    # every live hypothesis has the same sampled length (l - p), so their
    # score order equals their ranked order — admitting just the best live
    # as one extra candidate is argmax-equivalent to openai's full pad.
    live_best = jnp.argmax(scores, axis=1)
    live_tokens = tokens.reshape(b, w, l)[jnp.arange(b), live_best]
    live_scores = scores[jnp.arange(b), live_best]
    admit_live = fin_count < w
    fb_scores = jnp.where(admit_live, live_scores, neg)
    fin_scores = jnp.concatenate([fin_scores, fb_scores[:, None]], axis=1)
    fin_tokens = jnp.concatenate([fin_tokens, live_tokens[:, None]], axis=1)
    fin_lengths = jnp.concatenate(
        [fin_lengths, jnp.full((b, 1), float(max(l - p, 1)))], axis=1
    )
    best = jnp.argmax(fin_scores / fin_lengths, axis=1)
    return fin_tokens[jnp.arange(b), best]


# -- log-mel frontend ----------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _whisper_mel_fb(n_mels: int = N_MELS) -> np.ndarray:
    return mel_filterbank(sr=SAMPLE_RATE, n_fft=N_FFT, n_mels=n_mels, fmin=0.0,
                          fmax=SAMPLE_RATE / 2)


@functools.partial(jax.jit, static_argnames=("n_mels",))
def log_mel_whisper(wave: Array, n_mels: int = N_MELS) -> Array:
    """[B, 480000] 16 kHz waveform -> [B, 3000, n_mels] Whisper log-mel
    (openai whisper/audio.py log_mel_spectrogram: log10, per-item dynamic
    range clamp to 8, (x+4)/4 scaling; last STFT frame dropped)."""
    power = stft_power(wave, n_fft=N_FFT, hop=HOP)[:, :-1]  # [B, 3000, 201]
    mel = jnp.einsum("btf,fm->btm", power, jnp.asarray(_whisper_mel_fb(n_mels)))
    log_spec = jnp.log10(jnp.clip(mel, 1e-10, None))
    cap = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    return (jnp.maximum(log_spec, cap) + 4.0) / 4.0


# -- weight conversion ----------------------------------------------------------------


def convert_hf_whisper(
    sd: Mapping[str, np.ndarray], cfg: WhisperJaxConfig
) -> tuple[dict, dict]:
    """HF WhisperModel/WhisperForConditionalGeneration state dict ->
    (encoder_params, decoder_params). Accepts keys with or without the
    leading ``model.``; proj_out is tied to decoder.embed_tokens in every
    released Whisper, so it is not read."""
    sd = {k.removeprefix("model."): np.asarray(v) for k, v in sd.items()}

    def lin(name, bias=True):
        out = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
        if bias:
            out["bias"] = sd[f"{name}.bias"]
        return out

    def ln(name):
        return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}

    def conv(name):
        # torch Conv1d [out, in, k] -> flax Conv [k, in, out]
        return {
            "kernel": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 1, 0)),
            "bias": sd[f"{name}.bias"],
        }

    enc: dict = {
        "conv1": conv("encoder.conv1"),
        "conv2": conv("encoder.conv2"),
        "pos_embed": sd["encoder.embed_positions.weight"],
        "ln": ln("encoder.layer_norm"),
    }
    for i in range(cfg.enc_layers):
        p = f"encoder.layers.{i}."
        enc[f"layer_{i}"] = {
            "self_ln": ln(f"{p}self_attn_layer_norm"),
            "q": lin(f"{p}self_attn.q_proj"),
            "k": lin(f"{p}self_attn.k_proj", bias=False),
            "v": lin(f"{p}self_attn.v_proj"),
            "attn_out": lin(f"{p}self_attn.out_proj"),
            "final_ln": ln(f"{p}final_layer_norm"),
            "fc1": lin(f"{p}fc1"),
            "fc2": lin(f"{p}fc2"),
        }

    dec: dict = {
        "tok_embed": sd["decoder.embed_tokens.weight"],
        "pos_embed": sd["decoder.embed_positions.weight"],
        "ln": ln("decoder.layer_norm"),
    }
    for i in range(cfg.dec_layers):
        p = f"decoder.layers.{i}."
        dec[f"layer_{i}"] = {
            "self_ln": ln(f"{p}self_attn_layer_norm"),
            "sq": lin(f"{p}self_attn.q_proj"),
            "sk": lin(f"{p}self_attn.k_proj", bias=False),
            "sv": lin(f"{p}self_attn.v_proj"),
            "s_out": lin(f"{p}self_attn.out_proj"),
            "cross_ln": ln(f"{p}encoder_attn_layer_norm"),
            "cq": lin(f"{p}encoder_attn.q_proj"),
            "ck": lin(f"{p}encoder_attn.k_proj", bias=False),
            "cv": lin(f"{p}encoder_attn.v_proj"),
            "c_out": lin(f"{p}encoder_attn.out_proj"),
            "final_ln": ln(f"{p}final_layer_norm"),
            "fc1": lin(f"{p}fc1"),
            "fc2": lin(f"{p}fc2"),
        }
    return enc, dec


def config_from_hf(hf_cfg) -> WhisperJaxConfig:
    """Map an HF WhisperConfig to WhisperJaxConfig (dims + vocab layout).

    The two released vocab layouts (multilingual 51865+, English-only 51864)
    pin <|endoftext|>; generic HF constructors default eos_token_id to 50256
    regardless, so the vocab size is the more reliable signal."""
    vocab = hf_cfg.vocab_size
    multilingual = vocab >= 51865
    eot = 50257 if multilingual else 50256
    sot = eot + 1
    # Specials sit right after the language-tag block (openai whisper/
    # tokenizer.py specials order: langs, <|translate|>, <|transcribe|>,
    # <|startoflm|>, <|startofprev|>, <|nospeech|>, <|notimestamps|>,
    # timestamps). The lang block is 99 slots in the original vocabs
    # (51864/51865) and 100 in large-v3/v3-turbo's 51866 (adds <|yue|>),
    # which shifts EVERY special by one — deriving from the 99-slot layout
    # on a v3 checkpoint would condition on <|translate|> instead of
    # <|transcribe|> and misparse every timestamp.
    # n_langs=0 marks English-only checkpoints: *.en models are trained with
    # the bare <|startoftranscript|> prompt (no lang/task tokens) — WhisperASR
    # keys its prompt choice off this; their vocab still CARRIES the 99 slots,
    # so the special offsets use the layout width, not n_langs.
    lang_slots = 100 if vocab >= 51866 else 99
    n_langs = lang_slots if multilingual else 0
    translate = sot + 1 + lang_slots
    return WhisperJaxConfig(
        vocab_size=vocab,
        n_mels=hf_cfg.num_mel_bins,
        d_model=hf_cfg.d_model,
        enc_layers=hf_cfg.encoder_layers,
        dec_layers=hf_cfg.decoder_layers,
        heads=hf_cfg.encoder_attention_heads,
        d_ff=hf_cfg.encoder_ffn_dim,
        max_source_positions=hf_cfg.max_source_positions,
        max_target_positions=hf_cfg.max_target_positions,
        eot=eot,
        sot=sot,
        lang_begin=sot + 1,
        n_langs=n_langs,
        translate=translate,
        transcribe=translate + 1,
        no_speech=translate + 4,
        no_timestamps=translate + 5,
        timestamp_begin=translate + 6,
    )


# -- segment extraction + chunked transcription ---------------------------------------


def tokens_to_segments(
    tokens: np.ndarray,  # [L] one row of greedy_decode output (prompt included)
    cfg: WhisperJaxConfig,
    decode_text,  # callable: list[int] -> str (tokenizer.decode)
    offset_s: float = 0.0,
) -> list[dict]:
    """<|t0|> text <|t1|> pairs -> [{start, end, text, tokens}] (whisper's
    segment structure, the shape bin_transcript_per_second consumes; "tokens"
    carries the text token ids for the word aligner, whisper_align.py)."""
    ts0 = cfg.timestamp_begin
    segments: list[dict] = []
    start: float | None = None
    text_ids: list[int] = []
    for tok in tokens.tolist():
        if tok == cfg.eot:
            break
        if tok >= ts0:
            t = (tok - ts0) * TIME_PER_TOKEN + offset_s
            if start is None:
                start = t
            else:
                text = decode_text(text_ids).strip()
                if text:
                    segments.append(
                        {"start": start, "end": t, "text": text,
                         "tokens": list(text_ids)}
                    )
                start = None
                text_ids = []
        elif tok < cfg.eot and start is not None:
            text_ids.append(tok)
    if start is not None and text_ids:
        # unterminated final segment: close at the chunk boundary
        text = decode_text(text_ids).strip()
        if text:
            segments.append(
                {"start": start, "end": offset_s + CHUNK_S, "text": text,
                 "tokens": list(text_ids)}
            )
    return segments


class WhisperASR:
    """Host-side orchestration: waveform -> 30 s chunks -> batched TPU
    encode+decode -> timestamped segments.

    ``tokenizer`` needs only ``decode(ids) -> str``. ``language`` picks the
    language token (e.g. "en"); HF tokenizers expose the id via
    convert_tokens_to_ids("<|en|>") — pass ``lang_id`` directly when using a
    bare vocab."""

    def __init__(
        self,
        cfg: WhisperJaxConfig,
        enc_params,
        dec_params,
        tokenizer,
        lang_id: int | None = None,
        compute_dtype: str = "float32",
        max_chunk_batch: int = 16,
        alignment_heads: Sequence[tuple[int, int]] | None = None,
        auto_language: bool = False,
        beam_size: int = 1,
        no_speech_threshold: float | None = None,
    ):
        """``no_speech_threshold`` (e.g. openai's 0.6) drops a chunk's
        segments when P(<|nospeech|>) at the sot position exceeds it — the
        silence gate that suppresses Whisper's silence hallucinations.
        Opt-in and slightly more aggressive than openai, which additionally
        requires avg_logprob below -1.0 before skipping (decoding that
        needs per-token logprob accumulation in the decode loop); the
        reference's whisperx path gates silence with an external VAD
        instead (text_feature_extractor.py:129-160)."""
        self.no_speech_threshold = no_speech_threshold
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.beam_size = beam_size
        self.max_chunk_batch = max_chunk_batch
        self.encoder = WhisperEncoder(cfg, compute_dtype)
        self.decoder = WhisperDecoder(cfg, compute_dtype)
        # device-resident once: host-numpy trees would re-cross the tunnel on
        # every greedy_decode call and inline into the jit as HLO literals
        self._enc_vars = jax.tree.map(jnp.asarray, {"params": enc_params})
        self._dec_vars = jax.tree.map(jnp.asarray, {"params": dec_params})
        # params threaded as jit ARGUMENTS (CLAUDE.md relay rule: closed-over
        # trees inflate the compile request -> HTTP 413 on large checkpoints)
        _encode_p = jax.jit(lambda v, mel: self.encoder.apply(v, mel))
        self._encode = lambda mel: _encode_p(self._enc_vars, mel)
        lang = lang_id if lang_id is not None else cfg.lang_begin  # <|en|>
        self.prompt = (
            (cfg.sot, lang, cfg.transcribe) if cfg.n_langs else (cfg.sot,)
        )
        self.alignment_heads = alignment_heads
        # per-video language detection (the reference's whisperx behavior);
        # each distinct language compiles its own decode program (the prompt
        # is static), which real corpora amortize over many videos
        self._auto_lang = auto_language and cfg.n_langs > 0
        self._aligner = None

    @property
    def aligner(self):
        """Lazily-built cross-attention word aligner (whisper_align.py)."""
        if self._aligner is None:
            from repurpose_tpu.extractors.whisper_align import WhisperAligner

            self._aligner = WhisperAligner(
                self.decoder, self._dec_vars, self.prompt, self.alignment_heads
            )
        return self._aligner

    def detect_language(self, wave_16k: np.ndarray) -> tuple[int, float]:
        """(language token id, probability) from the first 30 s of audio —
        openai's detect_language: one decoder step conditioned on <|sot|>,
        softmax restricted to the 99 language tokens. The reference gets this
        from whisperx's result["language"] (text_feature_extractor.py:131);
        here it is one extra TPU forward. English-only checkpoints
        (n_langs == 0) have nothing to detect and return (<|en|> slot, 1.0).
        """
        cfg = self.cfg
        if not cfg.n_langs:
            return cfg.lang_begin, 1.0
        if not hasattr(self, "_detect_fn"):
            # jitted once; an eager decoder forward would dispatch per-op
            # over the device tunnel (CLAUDE.md: always jit) — params as a
            # jit argument per the relay rule
            def _detect(dv, enc):
                logits = self.decoder.apply(
                    dv, jnp.asarray([[cfg.sot]], jnp.int32), enc
                )[0, 0]
                return jax.nn.softmax(
                    logits[cfg.lang_begin : cfg.lang_begin + cfg.n_langs]
                )

            _detect_p = jax.jit(_detect)
            self._detect_fn = lambda enc: _detect_p(self._dec_vars, enc)
        wave = np.zeros(N_SAMPLES, np.float32)
        wave[: min(len(wave_16k), N_SAMPLES)] = wave_16k[:N_SAMPLES]
        mel = log_mel_whisper(wave[None], n_mels=cfg.n_mels)
        lang_slice = self._detect_fn(self._encode(mel))
        idx = int(jnp.argmax(lang_slice))
        return cfg.lang_begin + idx, float(lang_slice[idx])

    @classmethod
    def from_hf_dir(
        cls,
        path: str,
        tokenizer=None,
        lang_id: int | None = None,
        compute_dtype: str = "bfloat16",
        max_chunk_batch: int = 16,
        alignment_heads: Sequence[tuple[int, int]] | None = None,
        auto_language: bool = False,
        beam_size: int = 1,
    ) -> "WhisperASR":
        """Build from a local HF Whisper checkpoint directory
        (config.json + model.safetensors / pytorch_model.bin [+ tokenizer
        files]). No network access — mirrors how the reference loads its
        pretrained ASR weights from a local cache."""
        import json
        import os

        from transformers import WhisperConfig

        with open(os.path.join(path, "config.json")) as f:
            hf_cfg = WhisperConfig(**json.load(f))
        cfg = config_from_hf(hf_cfg)

        # one checkpoint-loading recipe shared with the other extractors
        # (safetensors/bin/dir layouts + ckpt['model'] unwrap)
        from repurpose_tpu.preprocessing.pipeline import PreprocessingPipeline

        sd = PreprocessingPipeline._load_state_dict(path)
        enc_p, dec_p = convert_hf_whisper(sd, cfg)
        if alignment_heads is None:
            # published per-checkpoint head dump (generation_config.json /
            # bundled table); None falls back to top-half heads in the aligner
            from repurpose_tpu.extractors.whisper_align import (
                resolve_alignment_heads,
            )

            alignment_heads = resolve_alignment_heads(path=path, cfg=cfg)
        if tokenizer is None:
            from transformers import WhisperTokenizer

            tokenizer = WhisperTokenizer.from_pretrained(path, local_files_only=True)
            if lang_id is None:
                lid = tokenizer.convert_tokens_to_ids("<|en|>")
                lang_id = lid if lid is not None and lid >= 0 else None
        return cls(
            cfg, enc_p, dec_p, tokenizer, lang_id=lang_id,
            compute_dtype=compute_dtype, max_chunk_batch=max_chunk_batch,
            alignment_heads=alignment_heads, auto_language=auto_language,
            beam_size=beam_size,
        )

    def _no_speech_probs(self, enc, prompt: tuple[int, ...]):
        """Per-row P(<|nospeech|>) at the sot position — openai decoding.py
        reads the initial forward's logits at sot_index. One tiny
        teacher-forced decoder pass per block; jitted per prompt length."""
        if not hasattr(self, "_ns_fns"):
            self._ns_fns = {}
        key = len(prompt)
        if key not in self._ns_fns:

            def _ns(dv, enc_, toks):
                logits = self.decoder.apply(dv, toks, enc_)
                probs = jax.nn.softmax(logits[:, 0].astype(jnp.float32), axis=-1)
                return probs[:, self.cfg.no_speech]

            self._ns_fns[key] = jax.jit(_ns)
        toks = jnp.broadcast_to(
            jnp.asarray(prompt, jnp.int32)[None], (enc.shape[0], len(prompt))
        )
        return self._ns_fns[key](self._dec_vars, enc, toks)

    def transcribe_file(self, path: str, word_timestamps: bool = False) -> list[dict]:
        """Video/audio file -> segments (ffmpeg decode at 16 kHz host-side)."""
        from repurpose_tpu.preprocessing.media import load_audio

        return self.transcribe_wave(
            load_audio(path, sr=SAMPLE_RATE), word_timestamps=word_timestamps
        )

    def transcribe_wave(
        self, wave_16k: np.ndarray, word_timestamps: bool = False
    ) -> list[dict]:
        """Mono float waveform at 16 kHz -> [{start, end, text, tokens}].
        With ``word_timestamps`` each segment also carries
        ``words: [{word, start, end}]`` from the cross-attention DTW aligner
        (whisper_align.py) — the capability the reference gets from WhisperX
        (text_feature_extractor.py:129-160), with no second model."""
        from repurpose_tpu.extractors.whisper_align import (
            attach_words,
            words_from_matrix,
        )

        if len(wave_16k) == 0:
            # zero-length audio has nothing to transcribe; promoting it to
            # one all-zero chunk would invite Whisper's silence
            # hallucinations into the transcript
            return []
        prompt = self.prompt
        if self._auto_lang:
            lang, _ = self.detect_language(wave_16k)
            prompt = (self.cfg.sot, lang, self.cfg.transcribe)
        n = len(wave_16k)
        n_chunks = max(1, -(-n // N_SAMPLES))
        padded = np.zeros(n_chunks * N_SAMPLES, np.float32)
        padded[:n] = wave_16k
        chunks = padded.reshape(n_chunks, N_SAMPLES)
        segments: list[dict] = []
        for i in range(0, n_chunks, self.max_chunk_batch):
            block = chunks[i : i + self.max_chunk_batch]
            # stable batch shapes: pad every block up to a power-of-two bucket
            # (<= max_chunk_batch), so at most log2(max_chunk_batch)+1 decode
            # programs ever compile — per-video ragged sizes would each pay a
            # multi-minute remote compile on this box
            n_blk = block.shape[0]
            bucket = 1
            while bucket < n_blk:
                bucket *= 2
            bucket = min(bucket, self.max_chunk_batch)
            pad = bucket - n_blk
            if pad:
                block = np.concatenate([block, np.zeros((pad, N_SAMPLES), np.float32)])
            mel = log_mel_whisper(jnp.asarray(block), n_mels=self.cfg.n_mels)
            enc = self._encode(mel)
            if self.beam_size > 1:
                tokens = np.asarray(
                    beam_decode(
                        self.decoder, self._dec_vars, enc, prompt,
                        self.beam_size,
                    )
                )
            else:
                tokens = np.asarray(
                    greedy_decode(self.decoder, self._dec_vars, enc, prompt)
                )
            n_real = block.shape[0] - pad
            gated = np.zeros(block.shape[0], bool)
            if self.no_speech_threshold is not None:
                ns = np.asarray(self._no_speech_probs(enc, prompt))
                gated = ns > self.no_speech_threshold
            block_segments = [
                [] if gated[j] else tokens_to_segments(
                    tokens[j], self.cfg, self.tokenizer.decode,
                    offset_s=(i + j) * float(CHUNK_S),
                )
                for j in range(n_real)
            ]
            if word_timestamps and any(
                seg for segs in block_segments for seg in segs
            ):
                # one aligned pass over the whole block (pad rows align empty);
                # clamp to the aligner's token budget so words match matrix rows
                rows_text = [
                    [t for seg in segs for t in seg["tokens"]][
                        : self.aligner.text_budget
                    ]
                    for segs in block_segments
                ] + [[] for _ in range(pad)]
                content = [
                    max(min(n - (i + j) * N_SAMPLES, N_SAMPLES), 1)
                    for j in range(block.shape[0])
                ]
                mats = self.aligner.align_block(
                    rows_text, enc, content,
                    prompt=(*prompt, self.cfg.no_timestamps),
                )
                for j in range(n_real):
                    words = words_from_matrix(
                        mats[j], rows_text[j], self.tokenizer.decode,
                        offset_s=(i + j) * float(CHUNK_S),
                    )
                    attach_words(block_segments[j], words)
            for segs in block_segments:
                segments.extend(segs)
        return segments
