"""Audio frontend: Whisper-style log-mel spectrogram.

The reference model consumes precomputed mel spectrograms (whisper.zig:7 —
"processes mel spectrograms"; no frontend exists there). This provides the
standard Whisper feature pipeline so the model runs from raw waveforms:
hann-windowed STFT (n_fft=400, hop=160 @ 16 kHz), slaney-normalized mel
filterbank, log10 with the Whisper dynamic-range clamp and (x+4)/4 scaling.
"""
from __future__ import annotations

import functools

import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_SECONDS = 30


def _hz_to_mel(f):
    """Slaney mel scale (linear below 1 kHz, log above)."""
    f = np.asarray(f, np.float64)
    min_log_hz, min_log_mel = 1000.0, 15.0
    logstep = np.log(6.4) / 27.0
    mel = 3.0 * f / 200.0
    above = f >= min_log_hz
    return np.where(above,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz)
                    / logstep, mel)


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    min_log_hz, min_log_mel = 1000.0, 15.0
    logstep = np.log(6.4) / 27.0
    f = 200.0 * m / 3.0
    above = m >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


@functools.lru_cache(maxsize=4)
def mel_filterbank(n_mels: int = 80, n_fft: int = N_FFT,
                   sr: int = SAMPLE_RATE) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] triangular filters, slaney area-normalized."""
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fb = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lo, ctr, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)            # slaney norm
    return fb.astype(np.float32)


def log_mel_spectrogram(audio: np.ndarray, n_mels: int = 80,
                        sr: int = SAMPLE_RATE) -> np.ndarray:
    """waveform [T] float -> log-mel features [n_frames, n_mels].

    Matches the Whisper convention: reflect-padded centered STFT, power
    spectrum with the final frame dropped, log10 clamped to (max - 8), then
    (x + 4) / 4.
    """
    audio = np.asarray(audio, np.float32).reshape(-1)
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    pad = N_FFT // 2
    x = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - N_FFT) // HOP_LENGTH
    idx = (np.arange(N_FFT)[None, :]
           + HOP_LENGTH * np.arange(n_frames)[:, None])
    frames = x[idx] * window
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2     # [n_frames, n_freqs]
    spec = spec[:-1]                                     # whisper drops last
    mel = spec @ mel_filterbank(n_mels, N_FFT, sr).T
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def pad_or_trim(mel: np.ndarray, n_frames: int = 3000) -> np.ndarray:
    """Pad (zeros) or trim the frame axis to the model's fixed input length."""
    t = mel.shape[0]
    if t >= n_frames:
        return mel[:n_frames]
    return np.pad(mel, ((0, n_frames - t), (0, 0)))
