"""Train the blendshape-coefficient VAE on BlendVOCA.

Flag-compatible with reference ``script/train_vae.py`` (batch 32,
lr 1e-4 with 10% warmup, 20000 epochs, cyclical β over 10 cycles,
EMA 0.99, val every 10 epochs, ckpt every 200).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from said_tpu.cli._common import configure_platform, str2bool
from said_tpu.core.logging import MetricsWriter
from said_tpu.data.blendvoca import BlendVOCAVAEDataset
from said_tpu.data.loader import DataLoader, prefetch
from said_tpu.models.vae import BCVAE
from said_tpu.train.vae_train import (
    VAETrainConfig,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from said_tpu.utils.blendshape import load_blendshape_coeffs
from said_tpu.utils.scheduler import frange_cycle_linear


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Train the VAE for blendshape coefficients (TPU-native)"
    )
    parser.add_argument(
        "--coeffs_dir", type=str, default="../BlendVOCA/blendshape_coeffs"
    )
    parser.add_argument("--coeffs_std_path", type=str, default="")
    parser.add_argument("--output_dir", type=str, default="../output-vae")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=20000)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--weight_vel", type=float, default=1.0)
    parser.add_argument("--beta", type=float, default=1.0)
    parser.add_argument("--beta_cycle", type=int, default=10)
    parser.add_argument("--ema", type=str2bool, default=True)
    parser.add_argument("--ema_decay", type=float, default=0.99)
    parser.add_argument("--val_period", type=int, default=10)
    parser.add_argument("--val_repeat", type=int, default=10)
    parser.add_argument("--save_period", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--compilation_cache_dir", type=str, default="",
                        help="persistent XLA compile cache dir "
                             "(default ~/.cache/said_tpu/jax_comp_cache; "
                             "'none' disables)")
    args = parser.parse_args(argv)
    configure_platform(getattr(args, "device", ""),
                       getattr(args, "compilation_cache_dir", ""))

    model = BCVAE()
    rng = jax.random.PRNGKey(args.seed)
    variables = model.init(
        {"params": rng},
        jnp.zeros((1, model.seq_len, model.channels), jnp.float32),
        use_noise=False,
        train=False,
    )

    std = None
    if args.coeffs_std_path:
        std = jnp.asarray(load_blendshape_coeffs(args.coeffs_std_path)[0])

    train_dataset = BlendVOCAVAEDataset(
        blendshape_coeffs_dir=args.coeffs_dir, dataset_type="train", seed=args.seed
    )
    val_dataset = BlendVOCAVAEDataset(
        blendshape_coeffs_dir=args.coeffs_dir, dataset_type="val", seed=args.seed + 1
    )
    train_loader = DataLoader(
        train_dataset,
        batch_size=args.batch_size,
        sampler_replacement=True,
        collate_fn=BlendVOCAVAEDataset.collate_fn,
        seed=args.seed,
    )
    val_loader = DataLoader(
        val_dataset, batch_size=1, collate_fn=BlendVOCAVAEDataset.collate_fn
    )

    steps_per_epoch = len(train_loader)
    config = VAETrainConfig(
        learning_rate=args.learning_rate,
        warmup_steps=int(0.1 * steps_per_epoch * args.epochs),
        weight_vel=args.weight_vel,
        ema=args.ema,
        ema_decay=args.ema_decay,
    )
    state = create_train_state(
        config, variables["params"], variables.get("batch_stats", {})
    )
    betas = frange_cycle_linear(args.epochs, stop=args.beta, n_cycle=args.beta_cycle)

    # One dispatch per step → donate the state so params/opt/EMA update
    # in place instead of being copied into fresh output buffers.
    train_step = jax.jit(make_train_step(model, config), donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(model, config))
    writer = MetricsWriter(args.output_dir, "SAiD-VAE")
    os.makedirs(args.output_dir, exist_ok=True)

    for epoch in range(1, args.epochs + 1):
        beta_epoch = float(betas[epoch - 1])
        t0 = time.time()
        totals: dict = {}
        count = 0
        for batch in prefetch(train_loader):
            rng, step_rng = jax.random.split(rng)
            coeffs = jnp.asarray(batch.blendshape_coeffs)
            state, metrics = train_step(
                state, coeffs, std, jnp.float32(beta_epoch), step_rng
            )
            bsz = coeffs.shape[0]
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v) * bsz
            count += bsz

        logs = {f"Train/{k}": v / count for k, v in totals.items()}
        logs["Train/Beta"] = beta_epoch
        logs["Train/epoch_time_s"] = time.time() - t0

        if epoch % args.val_period == 0:
            vp = state.ema_params if state.ema_params is not None else state.params
            v_totals: dict = {}
            v_count = 0
            for _ in range(args.val_repeat):
                for batch in prefetch(val_loader):
                    rng, step_rng = jax.random.split(rng)
                    coeffs = jnp.asarray(batch.blendshape_coeffs)
                    metrics = eval_step(
                        vp, state.batch_stats, coeffs, std,
                        jnp.float32(beta_epoch), step_rng,
                    )
                    for k, v in metrics.items():
                        v_totals[k] = v_totals.get(k, 0.0) + float(v) * coeffs.shape[0]
                    v_count += coeffs.shape[0]
            logs.update({f"Validation/{k}": v / v_count for k, v in v_totals.items()})

        writer.log(logs, epoch)
        print(f"epoch {epoch}: " + ", ".join(f"{k}={v:.5f}" for k, v in logs.items()))

        if epoch % args.save_period == 0:
            from said_tpu.core.checkpoint import save_train_state

            path = save_train_state(os.path.join(args.output_dir, "ckpt"), state, epoch)
            print(f"saved train state → {path}")

    writer.close()


if __name__ == "__main__":
    main()
