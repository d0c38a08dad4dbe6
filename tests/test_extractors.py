"""Feature-extractor parity.

CLIP and MiniLM convert from randomly-initialized HuggingFace models (the
same architectures the reference loads pretrained); CNN14 converts from a
minimal torch replica exercising the exact conv/BN-fold/pool semantics.
All tiny configs — these validate conversion + architecture, not pretrained
quality.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from repurpose_tpu.extractors.audio_frontend import (
    hann_window,
    logmel,
    mel_filterbank,
    stft_power,
)
from repurpose_tpu.extractors.clip_vit import (
    CLIPVisionConfig,
    CLIPVisionEncoder,
    convert_hf_clip_vision,
    preprocess_frames,
)
from repurpose_tpu.extractors.cnn14 import CNN14, convert_panns_cnn14
from repurpose_tpu.extractors.minilm import MiniLMConfig, MiniLMEncoder, convert_hf_bert


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_clip_vision_matches_hf():
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModelWithProjection

    torch.manual_seed(0)
    hf_cfg = HFCfg(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
        projection_dim=48, hidden_act="quick_gelu",
    )
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()
    cfg = CLIPVisionConfig(
        image_size=32, patch_size=16, width=64, layers=2, heads=4,
        projection_dim=48,
    )
    params = convert_hf_clip_vision(_sd(hf), cfg)
    rng = np.random.default_rng(0)
    imgs = rng.normal(0, 1, (3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2))).image_embeds.numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    model = CLIPVisionEncoder(cfg, compute_dtype="float32")
    got = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_minilm_matches_hf_mean_pooling():
    from transformers import BertConfig, BertModel

    torch.manual_seed(1)
    hf_cfg = BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, layer_norm_eps=1e-12,
    )
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = MiniLMConfig(
        vocab_size=120, width=32, layers=2, heads=4, intermediate=64, max_position=40
    )
    params = convert_hf_bert(_sd(hf), cfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 120, (2, 16))
    mask = np.ones((2, 16), np.int64)
    mask[0, 10:] = 0
    with torch.no_grad():
        hidden = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    m = mask[..., None]
    want = (hidden * m).sum(1) / m.sum(1)
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    model = MiniLMEncoder(cfg)
    got = jax.jit(lambda p, i, a: model.apply({"params": p}, i, a))(
        params, jnp.asarray(ids), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class _TorchCnn14(torch.nn.Module):
    """Minimal torch replica of PANNs Cnn14 post-frontend (models.py layout)."""

    def __init__(self, n_mels=32, channels=(8, 16, 32, 64, 128, 256), embed=64):
        super().__init__()
        self.bn0 = torch.nn.BatchNorm2d(n_mels)
        in_ch = 1
        for i, ch in enumerate(channels, 1):
            blk = torch.nn.Module()
            blk.conv1 = torch.nn.Conv2d(in_ch, ch, 3, padding=1, bias=False)
            blk.bn1 = torch.nn.BatchNorm2d(ch)
            blk.conv2 = torch.nn.Conv2d(ch, ch, 3, padding=1, bias=False)
            blk.bn2 = torch.nn.BatchNorm2d(ch)
            setattr(self, f"conv_block{i}", blk)
            in_ch = ch
        self.fc1 = torch.nn.Linear(channels[-1], embed)

    def forward(self, mel):  # [B, T, mel]
        x = mel[:, None]  # [B,1,T,mel]
        x = self.bn0(x.transpose(1, 3)).transpose(1, 3)
        for i in range(1, 7):
            blk = getattr(self, f"conv_block{i}")
            x = torch.relu(blk.bn1(blk.conv1(x)))
            x = torch.relu(blk.bn2(blk.conv2(x)))
            if i < 6:
                x = torch.nn.functional.avg_pool2d(x, (2, 2))
        x = x.mean(dim=3)
        x = x.max(dim=2).values + x.mean(dim=2)
        return torch.relu(self.fc1(x))


def test_cnn14_matches_torch_replica():
    torch.manual_seed(2)
    tm = _TorchCnn14().eval()
    # give BN stats non-trivial values
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    from repurpose_tpu.extractors.cnn14 import CNN14Config

    params = convert_panns_cnn14(_sd(tm))
    rng = np.random.default_rng(3)
    mel = rng.normal(0, 3, (2, 64, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(mel)).numpy()
    cfg = CNN14Config(n_mels=32, embed_dim=64, channels=(8, 16, 32, 64, 128, 256))
    model = CNN14(cfg, compute_dtype="float32")
    got = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=1e-4)


def test_stft_matches_torch():
    rng = np.random.default_rng(4)
    wave = rng.normal(0, 0.3, (2, 22050)).astype(np.float32)
    got = np.asarray(stft_power(jnp.asarray(wave)))
    win = torch.tensor(hann_window(1024))
    want = (
        torch.stft(
            torch.tensor(wave), n_fft=1024, hop_length=320, window=win,
            center=True, pad_mode="reflect", return_complex=True,
        )
        .abs()
        .pow(2)
        .numpy()
        .transpose(0, 2, 1)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-4)


def test_mel_filterbank_properties():
    fb = mel_filterbank()
    assert fb.shape == (513, 64)
    assert (fb >= 0).all()
    # every mel filter has support, bands are ordered by center frequency
    centers = np.argmax(fb, axis=0)
    assert fb.sum(0).min() > 0
    assert (np.diff(centers) >= 0).all()


def test_logmel_shape_and_finite():
    rng = np.random.default_rng(5)
    wave = rng.normal(0, 0.1, (3, 22050)).astype(np.float32)
    out = np.asarray(logmel(jnp.asarray(wave)))
    assert out.shape == (3, 69, 64)
    assert np.isfinite(out).all()


def test_preprocess_frames_shape():
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 255, (2, 240, 320, 3), dtype=np.uint8)
    out = preprocess_frames(frames)
    assert out.shape == (2, 224, 224, 3)
    assert np.isfinite(out).all() and abs(float(out.mean())) < 5


# -- fallback audio features ----------------------------------------------------

def test_fallback_features_shape_and_pitch():
    from repurpose_tpu.extractors.fallback_audio import (
        fallback_features,
        fallback_features_window,
    )

    sr = 22050
    t = np.arange(sr) / sr
    a440 = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    a554 = np.sin(2 * np.pi * 554.37 * t).astype(np.float32)  # C#5

    fa = fallback_features_window(a440, sr)
    fc = fallback_features_window(a554, sr)
    assert fa.shape == (2048,)
    assert np.isfinite(fa).all()
    assert not fa[38:].any()  # informative dims only, zero-padded
    # chroma lives at dims 13..25; A (pitch class 9) vs C# (pitch class 1)
    chroma_a = fa[13:25]
    chroma_c = fc[13:25]
    assert int(np.argmax(chroma_a)) == 9
    assert int(np.argmax(chroma_c)) == 1

    full = fallback_features(np.concatenate([a440, a554, a440[: sr // 2]]), sr)
    assert full.shape == (3, 2048)
