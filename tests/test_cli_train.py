"""Training CLI loop: epochs, bucketing, validation, checkpoint export."""

import json
import os
import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from said_tpu.data.blendvoca import BLENDSHAPE_CLASSES, PERSON_IDS_TRAIN, PERSON_IDS_VAL
from said_tpu.models.said import SAID
from said_tpu.models.wav2vec2 import Wav2Vec2Config
from said_tpu.utils.audio import save_audio
from said_tpu.utils.blendshape import save_blendshape_coeffs

TINY_AUDIO = Wav2Vec2Config(
    conv_dim=(16, 16),
    conv_stride=(5, 2),
    conv_kernel=(10, 3),
    hidden_size=32,
    num_hidden_layers=1,
    num_attention_heads=2,
    intermediate_size=64,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    output_hidden_size=32,
)


@pytest.fixture(scope="module")
def toy_train_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("blendvoca_train")
    audio_dir = root / "audio"
    coeffs_dir = root / "blendshape_coeffs"
    rng = np.random.default_rng(0)
    for pid in PERSON_IDS_TRAIN[:2] + PERSON_IDS_VAL[:1]:
        (audio_dir / pid).mkdir(parents=True)
        (coeffs_dir / pid).mkdir(parents=True)
        for sid in [1, 2]:
            n = 130
            wave = 0.1 * rng.standard_normal(n * 16000 // 60).astype(np.float32)
            save_audio(str(audio_dir / pid / f"sentence{sid:02}.wav"), wave, 16000)
            coeffs = rng.uniform(0, 1, (n, 32)).astype(np.float32)
            save_blendshape_coeffs(
                coeffs, BLENDSHAPE_CLASSES, str(coeffs_dir / pid / f"sentence{sid:02}.csv")
            )
    return str(audio_dir), str(coeffs_dir)


def _tiny_model(attn_impl="auto", **kwargs):
    sp = attn_impl == "flash_sp"
    return SAID(
        audio_config=TINY_AUDIO,
        dtype=jnp.float32,
        self_attn_impl="flash_sp" if sp else "dense",
        encoder_attn_impl="flash_sp" if sp else "dense",
    )


def test_train_cli_two_epochs(toy_train_tree, tmp_path, monkeypatch):
    import said_tpu.cli.train as train_cli

    monkeypatch.setattr(train_cli, "build_said_model", _tiny_model)
    audio_dir, coeffs_dir = toy_train_tree
    out_dir = str(tmp_path / "out")
    train_cli.main([
        "--audio_dir", audio_dir,
        "--coeffs_dir", coeffs_dir,
        "--output_dir", out_dir,
        "--epochs", "2",
        "--batch_size", "2",
        "--num_warmup_epochs", "1",
        "--val_period", "2",
        "--val_repeat", "1",
        "--save_period", "2",
        "--window_bucket", "8",
        "--export_pth", "",
    ])
    # metrics logged
    metrics_path = pathlib.Path(out_dir) / "SAiD" / "metrics.jsonl"
    lines = [json.loads(l) for l in metrics_path.read_text().splitlines()]
    assert len(lines) == 2
    assert "Train/loss" in lines[0]
    assert np.isfinite(lines[0]["Train/loss"])
    assert "Validation/loss" in lines[1]  # val ran on epoch 2
    # full train state checkpointed
    assert (pathlib.Path(out_dir) / "ckpt" / "2").exists()


def test_train_cli_sequence_parallel(toy_train_tree, tmp_path, monkeypatch):
    """--mesh_seq 2: the window (frame) axis shards over a 'seq' mesh
    axis and gradients flow through the differentiable flash_sp
    attention — CLI-level sequence-parallel training, which the
    reference cannot express at all (SURVEY §2.9)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    import said_tpu.cli.train as train_cli

    monkeypatch.setattr(train_cli, "build_said_model", _tiny_model)
    audio_dir, coeffs_dir = toy_train_tree
    out_dir = str(tmp_path / "out-sp")
    train_cli.main([
        "--audio_dir", audio_dir,
        "--coeffs_dir", coeffs_dir,
        "--output_dir", out_dir,
        "--epochs", "1",
        "--batch_size", "2",
        "--num_warmup_epochs", "1",
        "--val_period", "1000",
        "--save_period", "1000",
        "--mesh_seq", "2",
        "--export_pth", "",
    ])
    metrics_path = pathlib.Path(out_dir) / "SAiD" / "metrics.jsonl"
    lines = [json.loads(l) for l in metrics_path.read_text().splitlines()]
    assert len(lines) == 1
    assert np.isfinite(lines[0]["Train/loss"])


def test_vae_train_cli_two_epochs(toy_train_tree, tmp_path):
    import said_tpu.cli.train_vae as vae_cli

    _, coeffs_dir = toy_train_tree
    out_dir = str(tmp_path / "out-vae")
    vae_cli.main([
        "--coeffs_dir", coeffs_dir,
        "--output_dir", out_dir,
        "--epochs", "2",
        "--batch_size", "2",
        "--val_period", "2",
        "--val_repeat", "1",
        "--save_period", "2",
    ])
    metrics_path = pathlib.Path(out_dir) / "SAiD-VAE" / "metrics.jsonl"
    lines = [json.loads(l) for l in metrics_path.read_text().splitlines()]
    assert len(lines) == 2
    assert np.isfinite(lines[0]["Train/loss"])
    assert "Validation/loss" in lines[1]
    assert (pathlib.Path(out_dir) / "ckpt" / "2").exists()


def test_train_resume_continues(toy_train_tree, tmp_path, monkeypatch):
    """Crash-resume: restart from the orbax checkpoint and keep training
    (the reference cannot resume at all — SURVEY §5.3/5.4)."""
    import said_tpu.cli.train as train_cli

    monkeypatch.setattr(train_cli, "build_said_model", _tiny_model)
    audio_dir, coeffs_dir = toy_train_tree
    out_dir = str(tmp_path / "out")
    common = [
        "--audio_dir", audio_dir,
        "--coeffs_dir", coeffs_dir,
        "--output_dir", out_dir,
        "--batch_size", "2",
        "--num_warmup_epochs", "1",
        "--val_period", "1000",
        "--save_period", "1",
        "--export_pth", "",
    ]
    train_cli.main(common + ["--epochs", "1"])
    ckpt = pathlib.Path(out_dir) / "ckpt" / "1"
    assert ckpt.exists()

    # "crash" and resume into a fresh process-equivalent run
    train_cli.main(common + ["--epochs", "1", "--resume", str(ckpt)])
    lines = [
        json.loads(l)
        for l in (pathlib.Path(out_dir) / "SAiD" / "metrics.jsonl").read_text().splitlines()
    ]
    assert len(lines) == 2  # one epoch per run, same log file
    assert all(np.isfinite(l["Train/loss"]) for l in lines)
