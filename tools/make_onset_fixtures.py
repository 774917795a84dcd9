"""Generate librosa-golden onset fixtures (run where librosa IS installed).

``said_tpu.utils.audio.compute_audio_beat_time`` is a librosa-free port
of the reference's ``librosa.onset.onset_detect(y, sr, units="time")``
(``/root/reference/said/util/audio.py:79-96``). Its semantics are pinned
by tests/test_audio_utils.py, but true output parity needs librosa
itself — which does not ship in this environment. This script, run on
any machine WITH librosa, dumps golden onset arrays for a deterministic
set of synthetic waveforms (reconstructed bit-identically by the test
from the same seeds, so no audio ships in the repo):

    python tools/make_onset_fixtures.py  # writes tests/fixtures/onset_golden.npz

Commit the .npz; tests/test_audio_utils.py's golden test auto-skips
until it exists (same env-gated pattern as the real-weights acceptance
suite). Keep ``make_fixture_waveforms`` in sync with the test.
"""

from __future__ import annotations

import os

import numpy as np

SR = 16000


def make_fixture_waveforms() -> list[np.ndarray]:
    """Deterministic synthetic clips covering the onset-relevant cases:
    isolated clicks, tone bursts over noise, dense beats, near-silence,
    and an onset in the last few frames (the peak_pick boundary zone)."""
    waves = []
    rng = np.random.default_rng(1234)

    # 1. three isolated clicks over silence
    w = np.zeros(SR * 2, np.float32)
    for t0 in (0.3, 0.9, 1.5):
        i = int(t0 * SR)
        w[i : i + 200] = np.hanning(200) * np.sin(
            2 * np.pi * 1000 * np.arange(200) / SR
        )
    waves.append(w)

    # 2. tone bursts of rising pitch over low noise
    w = (0.01 * rng.standard_normal(SR * 3)).astype(np.float32)
    for j, t0 in enumerate((0.2, 0.8, 1.4, 2.0, 2.6)):
        i = int(t0 * SR)
        n = 2000
        f = 300 * (j + 1)
        w[i : i + n] += (
            np.hanning(n) * 0.5 * np.sin(2 * np.pi * f * np.arange(n) / SR)
        ).astype(np.float32)
    waves.append(w)

    # 3. dense 8 Hz click train (stresses the wait parameter)
    w = np.zeros(int(SR * 1.5), np.float32)
    for i in range(0, len(w) - 100, SR // 8):
        w[i : i + 100] = 0.8 * np.hanning(100)
    waves.append(w)

    # 4. near-silence (noise floor only): usually no onsets
    waves.append((0.002 * rng.standard_normal(SR)).astype(np.float32))

    # 5. onset near the clip end (peak_pick's post_avg boundary zone)
    w = (0.01 * rng.standard_normal(SR)).astype(np.float32)
    i = len(w) - 800
    w[i : i + 600] += (np.hanning(600) * 0.7).astype(np.float32)
    waves.append(w)

    # 6. speech-like AM noise bursts
    w = (0.005 * rng.standard_normal(SR * 2)).astype(np.float32)
    env = np.clip(np.sin(2 * np.pi * 2.5 * np.arange(SR * 2) / SR), 0, None)
    w += (env * 0.3 * rng.standard_normal(SR * 2)).astype(np.float32)
    waves.append(w)

    return waves


def main() -> None:
    import librosa

    out = {}
    for i, w in enumerate(make_fixture_waveforms()):
        onsets = librosa.onset.onset_detect(y=w, sr=SR, units="time")
        out[f"onsets_{i}"] = np.asarray(onsets, np.float64)
        print(f"clip {i}: {len(onsets)} onsets -> {np.round(onsets, 3)}")
    out["librosa_version"] = np.array(librosa.__version__)
    path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures",
        "onset_golden.npz",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **out)
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
