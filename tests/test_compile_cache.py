"""Persistent-compilation-cache story for the CLIs (not just bench.py).

Cold, the 6-minute-clip program costs 95-400 s of XLA compile on this
host; the CLIs now enable jax's persistent cache by default (see
``cli/_common.configure_compilation_cache``) so a second invocation
deserializes compiled executables instead. The end-to-end test runs the
REAL inference CLI twice in subprocesses against a fresh cache dir and
counts compilation artifacts: run 1 must persist some, run 2 must
neither add nor rewrite any (every XLA compile served from cache).
"""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

import said_tpu.cli._common as common

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_cache_dir_resolution(tmp_path, monkeypatch):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    # explicit dir wins and is created
    d = tmp_path / "explicit"
    assert common.configure_compilation_cache(str(d)) == str(d)
    assert d.is_dir()
    # env fallback
    e = tmp_path / "from_env"
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(e))
    assert common.configure_compilation_cache() == str(e)
    # disable spellings
    for word in ("none", "off", "NONE", "disabled"):
        assert common.configure_compilation_cache(word) == ""
    # default lands under ~/.cache/said_tpu
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    got = common.configure_compilation_cache()
    assert got.endswith(os.path.join(".cache", "said_tpu", "jax_comp_cache"))


def _run_inference_cli(cache_dir, wav, out_csv):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + [p for p in sys.path if "axon_site" in p]
    ) or str(REPO)
    # persist EVERY compile (default only persists >1 s ones; the tiny
    # CPU programs here compile faster) — the env knob is mirrored into
    # the config API by configure_compilation_cache
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    subprocess.run(
        [
            sys.executable, "-m", "said_tpu.cli.inference",
            "--weights_path", "", "--audio_path", wav,
            "--output_path", out_csv, "--num_steps", "1",
            "--device", "cpu", "--compilation_cache_dir", str(cache_dir),
        ],
        check=True, env=env, cwd=str(REPO), timeout=420,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )


@pytest.mark.slow
def test_second_cli_invocation_skips_all_compiles(tmp_path):
    from scipy.io import wavfile

    wav = str(tmp_path / "t.wav")
    t = np.linspace(0, 0.1, 1600, endpoint=False)
    wavfile.write(wav, 16000, (0.3 * np.sin(2 * np.pi * 300 * t) * 32767).astype(np.int16))
    cache = tmp_path / "cache"

    _run_inference_cli(cache, wav, str(tmp_path / "a.csv"))
    entries = {p.name: p.stat().st_mtime for p in cache.iterdir()}
    assert entries, "first run persisted no compilation artifacts"

    _run_inference_cli(cache, wav, str(tmp_path / "b.csv"))
    entries2 = {p.name: p.stat().st_mtime for p in cache.iterdir()}
    # zero new artifacts and zero rewritten ones ⇒ every XLA compile in
    # run 2 was a persistent-cache hit (a miss would write its entry:
    # min_compile_time is forced to 0 above)
    assert entries2 == entries, (
        f"second run compiled: new/rewritten = "
        f"{set(entries2.items()) ^ set(entries.items())}"
    )
    # both runs produced the same output (same seed, same program)
    a = (tmp_path / "a.csv").read_bytes()
    b = (tmp_path / "b.csv").read_bytes()
    assert a == b
