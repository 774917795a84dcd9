"""End-to-end CLI integration on a synthetic BlendVOCA tree.

Drives the real entry points (random weights, few steps, short clips):
inference → CSV, test_inference → per-person sample dirs,
test_evaluate → FD/multimodality/WInD over the generated outputs,
inference_vae → reconstruction CSV.
"""

import os
import pathlib

import numpy as np
import pytest

from said_tpu.data.blendvoca import BLENDSHAPE_CLASSES, PERSON_IDS_TEST
from said_tpu.utils.audio import save_audio
from said_tpu.utils.blendshape import load_blendshape_coeffs, save_blendshape_coeffs

N_FRAMES = 132  # ≥ 120-frame VAE window + 2 padding windows
CLIP_SECS = N_FRAMES / 60.0


@pytest.fixture(scope="module")
def toy_test_split(tmp_path_factory):
    root = tmp_path_factory.mktemp("blendvoca_test")
    audio_dir = root / "audio"
    coeffs_dir = root / "blendshape_coeffs"
    rng = np.random.default_rng(0)
    for pid in PERSON_IDS_TEST:
        (audio_dir / pid).mkdir(parents=True)
        (coeffs_dir / pid).mkdir(parents=True)
        for sid in [1, 2]:
            wave = 0.1 * rng.standard_normal(int(16000 * CLIP_SECS)).astype(np.float32)
            save_audio(str(audio_dir / pid / f"sentence{sid:02}.wav"), wave, 16000)
            coeffs = rng.uniform(0, 1, (N_FRAMES, 32)).astype(np.float32)
            save_blendshape_coeffs(
                coeffs, BLENDSHAPE_CLASSES, str(coeffs_dir / pid / f"sentence{sid:02}.csv")
            )
    return str(root), str(audio_dir), str(coeffs_dir)


def test_inference_cli(toy_test_split, tmp_path):
    from said_tpu.cli.inference import main

    root, audio_dir, _ = toy_test_split
    out_csv = str(tmp_path / "out.csv")
    wav = os.path.join(audio_dir, PERSON_IDS_TEST[0], "sentence01.wav")
    main([
        "--weights_path", "",
        "--audio_path", wav,
        "--output_path", out_csv,
        "--num_steps", "4",
    ])
    coeffs = load_blendshape_coeffs(out_csv)
    assert coeffs.shape == (N_FRAMES, 32)
    assert coeffs.min() >= 0 and coeffs.max() <= 1


def test_inference_cli_masked_editing(toy_test_split, tmp_path):
    from said_tpu.cli.inference import main

    root, audio_dir, coeffs_dir = toy_test_split
    wav = os.path.join(audio_dir, PERSON_IDS_TEST[0], "sentence01.wav")
    init_csv = os.path.join(coeffs_dir, PERSON_IDS_TEST[0], "sentence01.csv")
    # keep the first half of the init sample
    mask = np.zeros((N_FRAMES, 32), dtype=np.float32)
    mask[: N_FRAMES // 2] = 1.0
    mask_csv = str(tmp_path / "mask.csv")
    save_blendshape_coeffs(mask, BLENDSHAPE_CLASSES, mask_csv)
    out_csv = str(tmp_path / "edited.csv")
    main([
        "--weights_path", "",
        "--audio_path", wav,
        "--output_path", out_csv,
        "--num_steps", "4",
        "--init_sample_path", init_csv,
        "--mask_path", mask_csv,
    ])
    out = load_blendshape_coeffs(out_csv)
    init = load_blendshape_coeffs(init_csv)
    # masked (kept) region must match the init sample
    np.testing.assert_allclose(out[: N_FRAMES // 2], init[: N_FRAMES // 2], atol=1e-4)


def test_inference_cli_streaming(toy_test_split, tmp_path):
    from said_tpu.cli.inference import main

    root, audio_dir, _ = toy_test_split
    out_csv = str(tmp_path / "streamed.csv")
    wav = os.path.join(audio_dir, PERSON_IDS_TEST[0], "sentence01.wav")
    main([
        "--weights_path", "",
        "--audio_path", wav,
        "--output_path", out_csv,
        "--num_steps", "4",
        "--streaming_window", "60",
        "--streaming_overlap", "12",
    ])
    coeffs = load_blendshape_coeffs(out_csv)
    assert coeffs.shape == (N_FRAMES, 32)
    assert coeffs.min() >= 0 and coeffs.max() <= 1


@pytest.fixture(scope="module")
def generated_dir(toy_test_split, tmp_path_factory):
    from said_tpu.cli.test_inference import main

    root, audio_dir, _ = toy_test_split
    out_dir = str(tmp_path_factory.mktemp("generated"))
    main([
        "--weights_path", "",
        "--audio_dir", audio_dir,
        "--output_dir", out_dir,
        "--num_steps", "2",
        "--num_repeats", "3",
        "--batch_size", "2",
    ])
    return out_dir


def test_test_inference_cli(generated_dir):
    for pid in PERSON_IDS_TEST:
        files = sorted(os.listdir(os.path.join(generated_dir, pid)))
        assert files == [
            "sentence01-0.csv", "sentence01-1.csv", "sentence01-2.csv",
            "sentence02-0.csv", "sentence02-1.csv", "sentence02-2.csv",
        ]
        coeffs = load_blendshape_coeffs(os.path.join(generated_dir, pid, files[0]))
        assert coeffs.shape == (N_FRAMES, 32)


def test_test_evaluate_cli(toy_test_split, generated_dir, capsys):
    vae_pth = pathlib.Path("/root/reference/model/vae.pth")
    if not vae_pth.exists():
        pytest.skip("pretrained eval VAE unavailable")
    from said_tpu.cli.test_evaluate import main

    root, audio_dir, coeffs_dir = toy_test_split
    main([
        "--audio_dir", audio_dir,
        "--coeffs_dir", coeffs_dir,
        "--eval_dir", generated_dir,
        "--vae_weights_path", str(vae_pth),
        "--wind_num_repeats", "2",
        "--wind_num_clusters", "2",
    ])
    out = capsys.readouterr().out
    assert "frechet_distance" in out
    assert "multimodality" in out
    assert "wind" in out


def test_test_evaluate_cli_reference_flags(toy_test_split, generated_dir, capsys):
    """The reference's own flag pair (--coeffs_dir = GENERATED,
    --coeffs_real_dir = real; script/test_evaluate.py:469-480) must work
    verbatim so reference command lines translate 1:1."""
    vae_pth = pathlib.Path("/root/reference/model/vae.pth")
    if not vae_pth.exists():
        pytest.skip("pretrained eval VAE unavailable")
    from said_tpu.cli.test_evaluate import main

    root, audio_dir, coeffs_dir = toy_test_split
    main([
        "--audio_dir", audio_dir,
        "--coeffs_dir", generated_dir,
        "--coeffs_real_dir", coeffs_dir,
        "--sampling_rate", "16000",
        "--fps", "60",
        "--vae_weights_path", str(vae_pth),
        "--wind_num_repeats", "2",
        "--wind_num_clusters", "2",
    ])
    out = capsys.readouterr().out
    assert "frechet_distance" in out
    assert "multimodality" in out
    assert "wind" in out


def test_inference_vae_cli(toy_test_split, tmp_path):
    vae_pth = pathlib.Path("/root/reference/model/vae.pth")
    if not vae_pth.exists():
        pytest.skip("pretrained eval VAE unavailable")
    from said_tpu.cli.inference_vae import main

    _, _, coeffs_dir = toy_test_split
    src = os.path.join(coeffs_dir, PERSON_IDS_TEST[0], "sentence01.csv")
    out_csv = str(tmp_path / "rec.csv")
    main([
        "--weights_path", str(vae_pth),
        "--blendshape_coeffs_path", src,
        "--output_path", out_csv,
    ])
    rec = load_blendshape_coeffs(out_csv)
    assert rec.shape == (120, 32)
    assert rec.min() >= 0.0 and rec.max() <= 1.0
