"""Audio utilities: WAV round trip, resampling, fit_audio_unet, onsets."""

import math

import numpy as np
import pytest

from said_tpu.utils.audio import (
    compute_audio_beat_time,
    fit_audio_unet,
    load_audio,
    resample,
    save_audio,
)


def test_wav_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    wave = (rng.uniform(-0.9, 0.9, 16000)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    save_audio(p, wave, 16000)
    loaded = load_audio(p, 16000)
    np.testing.assert_allclose(loaded, wave, atol=0.51 / 32768)


def test_load_resamples(tmp_path):
    rng = np.random.default_rng(1)
    wave = rng.uniform(-0.5, 0.5, 22050).astype(np.float32)
    p = str(tmp_path / "t22k.wav")
    save_audio(p, wave, 22050)
    loaded = load_audio(p, 16000)
    assert loaded.shape[0] == 16000


def test_resample_preserves_tone():
    """A pure tone must survive polyphase resampling with its frequency."""
    sr1, sr2, f = 22050, 16000, 440.0
    t = np.arange(sr1) / sr1
    tone = np.sin(2 * np.pi * f * t).astype(np.float32)
    out = resample(tone, sr1, sr2)
    assert abs(len(out) - sr2) <= 1
    spec = np.abs(np.fft.rfft(out[: sr2]))
    peak_hz = np.argmax(spec) * sr2 / sr2
    assert abs(peak_hz - f) < 2.0


def test_fit_audio_unet_reference_semantics():
    """window = int(len/sr·fps); pad so the coeff length divides the divisor."""
    sr, fps = 16000, 60
    wave = np.zeros(13000, dtype=np.float32)
    out = fit_audio_unet(wave, sr, fps, divisor_unet=1)
    assert out.window_size == int(13000 / sr * fps) == 48
    # divisor 1 → divisor_waveform = sr/gcd(sr,fps) = 800; ceil to multiple
    assert out.waveform.shape[0] == math.ceil(13000 / 800) * 800

    out4 = fit_audio_unet(wave, sr, fps, divisor_unet=4)
    assert out4.waveform.shape[0] % (800 * 4) == 0
    assert out4.window_size == 48  # reports the ORIGINAL length's window


def test_onset_detection_finds_clicks():
    """Sharp impulses in silence must be detected near their positions."""
    sr = 16000
    wave = np.zeros(sr * 2, dtype=np.float32)
    click_times = [0.25, 0.75, 1.25, 1.75]
    rng = np.random.default_rng(0)
    for ct in click_times:
        i = int(ct * sr)
        wave[i : i + 400] = rng.uniform(-1, 1, 400).astype(np.float32)
    onsets = compute_audio_beat_time(wave, sr)
    assert len(onsets) >= len(click_times)
    for ct in click_times:
        assert np.min(np.abs(onsets - ct)) < 0.08, (ct, onsets)
