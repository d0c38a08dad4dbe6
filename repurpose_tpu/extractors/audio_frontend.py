"""Waveform -> log-mel spectrogram, in jnp (the CNN14 input stage).

Reproduces the PANNs frontend the reference's audio extractor runs through
``panns_inference.AudioTagging`` (preprocessing/audio_feature_extractor.py:
115-142): torchlibrosa Spectrogram (n_fft 1024, hop 320, Hann, center=True
reflect pad, power) + LogmelFilterBank (sr 32000, 64 mels, fmin 50,
fmax 14000, Slaney norm, ref 1.0, amin 1e-10, top_db None).

Note the reference quirk, preserved at the pipeline level: audio is loaded at
22 050 Hz (audio_feature_extractor.py:121) and fed to a 32 kHz-trained model
unresampled — the mel filterbank below is still built with sr=32000 exactly
as PANNs does, so features match the reference bit-for-bit in spirit.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

SAMPLE_RATE = 32000
N_FFT = 1024
HOP = 320
N_MELS = 64
FMIN = 50.0
FMAX = 14000.0
AMIN = 1e-10


def hann_window(n: int) -> np.ndarray:
    """Periodic (fftbins) Hann, as librosa/torchlibrosa use."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    mel = f / f_sp
    log_region = f >= min_log_hz
    mel = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    hz = m * f_sp
    log_region = m >= min_log_mel
    return np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), hz)


def mel_filterbank(
    sr: int = SAMPLE_RATE,
    n_fft: int = N_FFT,
    n_mels: int = N_MELS,
    fmin: float = FMIN,
    fmax: float = FMAX,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank [n_fft//2+1, n_mels]
    (librosa.filters.mel semantics, which PANNs uses)."""
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(np.array(fmin)), _hz_to_mel_slaney(np.array(fmax)), n_mels + 2
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)
    weights = np.zeros((n_mels, len(fft_freqs)))
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # [freq, mel]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft_power(wave: Array, n_fft: int = N_FFT, hop: int = HOP) -> Array:
    """[B, L] waveform -> [B, frames, n_fft//2+1] power spectrogram
    (center=True, reflect pad — torchlibrosa defaults)."""
    pad = n_fft // 2
    x = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[:, idx]  # [B, frames, n_fft]
    win = jnp.asarray(hann_window(n_fft))
    spec = jnp.fft.rfft(frames * win, axis=-1)
    return (spec.real**2 + spec.imag**2).astype(jnp.float32)


def logmel(wave: Array, mel_fb: Array | None = None) -> Array:
    """[B, L] waveform -> [B, frames, n_mels] log-mel (ref=1, amin=1e-10,
    top_db=None — PANNs LogmelFilterBank settings)."""
    if mel_fb is None:
        mel_fb = jnp.asarray(mel_filterbank())
    power = stft_power(wave)
    mel = jnp.einsum("btf,fm->btm", power, mel_fb)
    return 10.0 * jnp.log10(jnp.clip(mel, AMIN, None))
