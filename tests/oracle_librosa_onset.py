"""Test-only oracle: librosa's onset-detection pipeline, re-derived.

librosa cannot be installed in this environment, so the parity oracle
for ``said_tpu.utils.audio.compute_audio_beat_time`` (which reproduces
``librosa.onset.onset_detect(y, sr, units="time")``, the reference's
call at ``said/util/audio.py:79-96``) is this module: an INDEPENDENT
straight-line numpy/scipy transcription of the published librosa 0.10
algorithm —

  onset_strength : mel power spectrogram (STFT n_fft=2048 hop=512,
      periodic Hann, centered constant padding; 128 Slaney-normalized
      mel bands) → power_to_db(ref=1, amin=1e-10, top_db=80) → lag-1
      positive spectral flux, mean over bands → zero-pad the start by
      ``lag + n_fft // (2·hop)`` frames, truncate to the frame count.
  onset_detect : min-shift + max-normalize the envelope, then
      util.peak_pick with the time-derived defaults (pre_max 0.03 s,
      post_max 0, pre_avg/post_avg 0.10 s, wait 0.03 s, delta 0.07),
      frames → seconds via ``frames · hop / sr``.

Deliberately written differently from the production port (explicit
per-frame loops, scipy windows, the peak_pick boundary-correction while
loops verbatim from the published pseudocode) so agreement between the
two is evidence of correctness, not shared bugs. Everything runs in
float64 for an unambiguous reference value.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage, signal


def _stft_power(y: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """|STFT|² with librosa's centered constant padding; (frames, bins)."""
    y = np.asarray(y, dtype=np.float64)
    ypad = np.concatenate(
        [np.zeros(n_fft // 2), y, np.zeros(n_fft // 2)]
    )
    win = signal.get_window("hann", n_fft, fftbins=True)
    n_frames = 1 + (len(ypad) - n_fft) // hop
    out = np.empty((n_frames, n_fft // 2 + 1))
    for i in range(n_frames):
        frame = ypad[i * hop : i * hop + n_fft] * win
        out[i] = np.abs(np.fft.rfft(frame)) ** 2
    return out


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    out = f / (200.0 / 3.0)
    log_region = f >= 1000.0
    out = np.where(
        log_region,
        15.0 + np.log(np.maximum(f, 1e-30) / 1000.0) / (np.log(6.4) / 27.0),
        out,
    )
    return out


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    out = m * (200.0 / 3.0)
    log_region = m >= 15.0
    out = np.where(
        log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), out
    )
    return out


def _mel_bank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """(n_mels, bins) Slaney-style triangular bank with area norm."""
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    pts = _mel_to_hz_slaney(
        np.linspace(
            _hz_to_mel_slaney(0.0), _hz_to_mel_slaney(sr / 2.0), n_mels + 2
        )
    )
    bank = np.zeros((n_mels, len(bins)))
    for i in range(n_mels):
        lo, mid, hi = pts[i], pts[i + 1], pts[i + 2]
        rising = (bins - lo) / (mid - lo)
        falling = (hi - bins) / (hi - mid)
        tri = np.maximum(0.0, np.minimum(rising, falling))
        bank[i] = tri * (2.0 / (hi - lo))
    return bank


def oracle_onset_strength(
    y: np.ndarray,
    sr: int,
    n_fft: int = 2048,
    hop: int = 512,
    n_mels: int = 128,
    lag: int = 1,
) -> np.ndarray:
    power = _stft_power(y, n_fft, hop)  # (frames, bins)
    mel = power @ _mel_bank(sr, n_fft, n_mels).T  # (frames, mels)
    db = 10.0 * np.log10(np.maximum(mel, 1e-10))
    db = np.maximum(db, db.max() - 80.0)

    flux = np.maximum(0.0, db[lag:] - db[:-lag]).mean(axis=1)
    pad = lag + n_fft // (2 * hop)
    env = np.concatenate([np.zeros(pad), flux])[: power.shape[0]]
    return env


def oracle_peak_pick(
    x: np.ndarray,
    pre_max: int,
    post_max: int,
    pre_avg: int,
    post_avg: int,
    delta: float,
    wait: int,
) -> np.ndarray:
    """librosa.util.peak_pick, transcribed from the published algorithm."""
    x = np.asarray(x, dtype=np.float64)
    max_length = pre_max + post_max
    max_origin = int(np.ceil(0.5 * (pre_max - post_max)))
    mov_max = ndimage.maximum_filter1d(
        x, int(max_length), mode="constant", origin=max_origin, cval=x.min()
    )

    avg_length = pre_avg + post_avg
    avg_origin = int(np.ceil(0.5 * (pre_avg - post_avg)))
    mov_avg = ndimage.uniform_filter1d(
        x, int(avg_length), mode="nearest", origin=avg_origin
    )
    n = 0
    while n - pre_avg < 0 and n < x.shape[0]:
        start = max(n - pre_avg, 0)
        mov_avg[n] = np.mean(x[start : n + post_avg])
        n += 1
    n = x.shape[0] - post_avg
    while n < x.shape[0]:
        start = max(n - pre_avg, 0)
        mov_avg[n] = np.mean(x[start : n + post_avg])
        n += 1

    detections = x * (x == mov_max)
    detections = detections * (detections >= (mov_avg + delta))
    peaks = []
    last_onset = -np.inf
    for i in np.nonzero(detections)[0]:
        if i > last_onset + wait:
            peaks.append(i)
            last_onset = i
    return np.asarray(peaks, dtype=np.int64)


def oracle_onset_detect_time(y: np.ndarray, sr: int) -> np.ndarray:
    """librosa.onset.onset_detect(y=y, sr=sr, units='time') defaults."""
    hop = 512
    env = oracle_onset_strength(y, sr, hop=hop)
    if not env.any():
        return np.array([], dtype=np.float64)
    env = env - env.min()
    env = env / (env.max() + np.finfo(np.float32).tiny)
    peaks = oracle_peak_pick(
        env,
        pre_max=int(0.03 * sr // hop),
        post_max=int(0.00 * sr // hop) + 1,
        pre_avg=int(0.10 * sr // hop),
        post_avg=int(0.10 * sr // hop) + 1,
        delta=0.07,
        wait=int(0.03 * sr // hop),
    )
    return peaks * hop / sr
