"""Train the SAiD denoiser on BlendVOCA.

Flag-compatible with reference ``script/train.py`` (same defaults:
batch 8, lr 1e-5, 100000 epochs with 5000 warmup epochs, uncond_prob
0.1, EMA 0.9999, val every 200 epochs × 50 repeats, ckpt every 200).

TPU-first differences (documented, not silent):

- The train step is ONE jitted program; batches are sharded over the
  mesh's 'data' axis (``--mesh_data`` devices), XLA inserts the
  gradient all-reduce. ``--mesh_seq`` additionally shards the window
  (frame) axis — sequence-parallel training through the differentiable
  flash_sp attention, for full-clip fine-tuning.
- Random window sizes are padded up to multiples of ``--window_bucket``
  (default 8) with masked norms/attention/losses, so a handful of
  compiled programs serve the reference's fully-random window
  distribution EXACTLY (the padding is numerically invisible; the
  reference's sizes would otherwise trigger a recompile per step).
- Checkpoints are full train states (params/opt/EMA/step, orbax) AND a
  reference-compatible ``{epoch}.pth`` can be exported with
  ``--export_pth`` (EMA weights, like the reference saves).
- Training resume (``--resume``) — absent in the reference — restores
  the full state.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from said_tpu.cli._common import configure_platform, build_said_model, init_said_params, load_said_params, str2bool
from said_tpu.core.logging import MetricsWriter
from said_tpu.data.blendvoca import (
    BlendVOCATrainDataset,
    BlendVOCAValDataset,
)
from said_tpu.data.loader import DataLoader, prefetch
from said_tpu.diffusion.schedule import DiffusionSchedule
from said_tpu.models.said import process_audio
from said_tpu.parallel.mesh import (
    MeshConfig,
    make_mesh,
    maybe_init_distributed,
    put_global,
    shard_params,
)
from said_tpu.train.said_train import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    merge_trainable,
)
from said_tpu.utils.blendshape import load_blendshape_coeffs


def add_arguments(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--audio_dir", type=str, default="../BlendVOCA/audio")
    parser.add_argument(
        "--coeffs_dir", type=str, default="../BlendVOCA/blendshape_coeffs"
    )
    parser.add_argument("--coeffs_std_path", type=str, default="")
    parser.add_argument("--blendshape_residuals_path", type=str, default="")
    parser.add_argument("--landmarks_path", type=str, default="")
    parser.add_argument("--output_dir", type=str, default="../output")
    parser.add_argument("--prediction_type", type=str, default="epsilon")
    parser.add_argument("--window_size_min", type=int, default=120)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=100000)
    parser.add_argument("--num_warmup_epochs", type=int, default=5000)
    parser.add_argument("--num_workers", type=int, default=0, help="ignored")
    parser.add_argument("--learning_rate", type=float, default=1e-5)
    parser.add_argument("--uncond_prob", type=float, default=0.1)
    parser.add_argument("--unet_feature_dim", type=int, default=-1)
    parser.add_argument("--weight_vel", type=float, default=1.0)
    parser.add_argument("--weight_vertex", type=float, default=0.02)
    parser.add_argument("--ema", type=str2bool, default=True)
    parser.add_argument("--ema_decay", type=float, default=0.9999)
    parser.add_argument("--val_period", type=int, default=200)
    parser.add_argument("--val_repeat", type=int, default=50)
    parser.add_argument("--save_period", type=int, default=200)
    # TPU-native extensions
    parser.add_argument("--window_bucket", type=int, default=8)
    parser.add_argument(
        "--val_window_bucket", type=int, default=128,
        help="pad validation clips (full-length, ~80 distinct lengths) up "
             "to multiples of this many frames with masked losses — a "
             "handful of compiled programs instead of one per clip length",
    )
    parser.add_argument(
        "--gradient_checkpointing", type=str2bool, default=False,
        help="recompute UNet block activations in the backward pass "
             "(jax.remat) — trades FLOPs for activation memory on long "
             "windows (reference mechanism: said/model/ldm/util.py:17-63)",
    )
    parser.add_argument("--mesh_data", type=int, default=-1)
    parser.add_argument("--mesh_model", type=int, default=1)
    parser.add_argument(
        "--mesh_seq", type=int, default=1,
        help="shard the window (frame) axis over this many devices — "
             "sequence-parallel training via the differentiable flash_sp "
             "attention (full-clip fine-tuning when windows exceed one "
             "chip; the reference caps windows instead, "
             "dataset_voca.py:553-554). Window buckets are rounded up so "
             "the shard count divides every padded window.",
    )
    parser.add_argument("--init_weights", type=str, default="",
                        help="optional pretrained .pth (e.g. wav2vec2 import)")
    parser.add_argument("--resume", type=str, default="")
    parser.add_argument("--export_pth", type=str2bool, default=True)
    parser.add_argument(
        "--spec_augment", type=str2bool, default=True,
        help="apply wav2vec2 time masking during training (the reference "
             "trains with the HF encoder in train mode, which does this)",
    )
    parser.add_argument(
        "--encoder_train_mode", type=str2bool, default=True,
        help="run the frozen wav2vec2 encoder with train-mode "
             "stochasticity (hidden/attention/activation dropout + "
             "layerdrop) during SAiD training, matching the reference "
             "(script/train.py:547-548 freezes params only, leaving the "
             "HF module in train mode). Set to '' to disable.",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--dtype", type=str, default="float32", choices=["float32", "bfloat16"]
    )


def _bucket_up(window_size: int, bucket: int) -> int:
    if bucket <= 1:
        return window_size
    return int(np.ceil(window_size / bucket) * bucket)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Train the SAiD model using BlendVOCA dataset (TPU-native)"
    )
    add_arguments(parser)
    parser.add_argument("--compilation_cache_dir", type=str, default="",
                        help="persistent XLA compile cache dir "
                             "(default ~/.cache/said_tpu/jax_comp_cache; "
                             "'none' disables)")
    args = parser.parse_args(argv)
    configure_platform(getattr(args, "device", ""),
                       getattr(args, "compilation_cache_dir", ""))

    maybe_init_distributed()  # multi-host: no-op unless a coordinator is set

    seq_axis = max(args.mesh_seq, 1)
    if seq_axis > 1:
        import math as _math

        # every padded window (train and val buckets) must divide the
        # seq axis so the frame sharding is even
        args.window_bucket = _math.lcm(max(args.window_bucket, 1), seq_axis)
        args.val_window_bucket = _math.lcm(
            max(args.val_window_bucket, 1), seq_axis
        )

    model = build_said_model(
        prediction_type=args.prediction_type,
        feature_dim=args.unet_feature_dim,
        dtype=args.dtype,
        attn_impl="flash_sp" if seq_axis > 1 else "auto",
        remat=bool(args.gradient_checkpointing),
    )
    schedule = DiffusionSchedule.create(
        model.diffusion_steps, args.prediction_type
    )

    std = None
    if args.coeffs_std_path:
        std = jnp.asarray(load_blendshape_coeffs(args.coeffs_std_path)[0])

    train_dataset = BlendVOCATrainDataset(
        audio_dir=args.audio_dir,
        blendshape_coeffs_dir=args.coeffs_dir,
        blendshape_deltas_path=args.blendshape_residuals_path or None,
        landmarks_path=args.landmarks_path or None,
        sampling_rate=16000,
        window_size_min=args.window_size_min,
        uncond_prob=args.uncond_prob,
        seed=args.seed,
    )
    val_dataset = BlendVOCAValDataset(
        audio_dir=args.audio_dir,
        blendshape_coeffs_dir=args.coeffs_dir,
        blendshape_deltas_path=args.blendshape_residuals_path or None,
        landmarks_path=args.landmarks_path or None,
        sampling_rate=16000,
        uncond_prob=args.uncond_prob,
        seed=args.seed + 1,
    )

    train_loader = DataLoader(
        train_dataset,
        batch_size=args.batch_size,
        sampler_replacement=True,
        collate_fn=train_dataset.collate_fn,
        seed=args.seed,
    )
    steps_per_epoch = len(train_loader)

    config = TrainConfig(
        learning_rate=args.learning_rate,
        warmup_steps=steps_per_epoch * args.num_warmup_epochs,
        weight_vel=args.weight_vel,
        weight_vertex=args.weight_vertex,
        ema=args.ema,
        ema_decay=args.ema_decay,
        prediction_type=args.prediction_type,
        encoder_train_mode=bool(args.encoder_train_mode),
    )

    params = (
        load_said_params(args.init_weights, model, seed=args.seed)
        if args.init_weights
        else init_said_params(model, seed=args.seed)
    )

    import jax as _jax

    from said_tpu.parallel.mesh import fit_data_axis

    n_devices = len(_jax.devices())
    data_axis = (
        args.mesh_data
        if args.mesh_data > 0
        else fit_data_axis(args.batch_size, n_devices, args.mesh_model, seq_axis)
    )
    mesh = make_mesh(
        MeshConfig(data=data_axis, model=args.mesh_model, seq=seq_axis),
        devices=_jax.devices()[: data_axis * args.mesh_model * seq_axis],
    )
    params = shard_params(params, mesh)
    state = create_train_state(config, params)

    if args.resume:
        # Restore to host values (migrating pre-r4 full-tree layouts —
        # see restore_train_state_any_layout), then re-place every leaf
        # on the mesh: mesh-sharded leaves keep their sharding,
        # everything else (e.g. the step counter, which orbax would
        # otherwise pin to one device and clash with the sharded params)
        # is mesh-replicated.
        from jax.sharding import NamedSharding

        from said_tpu.parallel.mesh import replicated
        from said_tpu.train.said_train import restore_train_state_any_layout

        restored = restore_train_state_any_layout(args.resume, state, config)

        def place(r, f):
            sh = getattr(f, "sharding", None)
            if not isinstance(sh, NamedSharding):
                sh = replicated(mesh)
            return jax.device_put(np.asarray(r), sh)

        state = jax.tree_util.tree_map(place, restored, state)
        print(f"resumed from {args.resume} at step {int(state.step)}")

    # Donate the state: real training runs one dispatch per step, so
    # without donation XLA copies every params/opt/EMA buffer into fresh
    # outputs each step (~240 MB of pure HBM copy for the trainable tree,
    # plus the frozen encoder's pass-through). The loop never touches the
    # old state after the call, so in-place update is safe.
    train_step = jax.jit(
        make_train_step(model, schedule, config), donate_argnums=(0,)
    )
    eval_step = jax.jit(make_eval_step(model, schedule, config))

    writer = MetricsWriter(args.output_dir, "SAiD")
    rng = jax.random.PRNGKey(args.seed)
    spec_rng = np.random.default_rng(args.seed + 17)

    os.makedirs(args.output_dir, exist_ok=True)

    def prepare_batch(batch, bucket_size=None, augment=True):
        """Collated numpy batch → device arrays.

        Windows are PADDED up to the next ``bucket_size`` multiple
        (default --window_bucket) and the real length is passed through;
        masked norms/attention/losses make the result numerically
        identical to the unpadded batch, so one compiled program per
        bucket serves the reference's fully-random window-size
        distribution without changing it. Validation uses a coarser
        --val_window_bucket with ``augment=False`` (no spec-augment).
        """
        if bucket_size is None:
            bucket_size = args.window_bucket
        coeffs = batch.blendshape_coeffs
        ws_real = coeffs.shape[1]
        wave_real = len(batch.waveform[0])
        dynamic = bucket_size > 1
        if dynamic:
            target = _bucket_up(ws_real, bucket_size)
            wave_target = int(np.ceil(target * 16000 / 60))
            coeffs = np.pad(coeffs, ((0, 0), (0, target - ws_real), (0, 0)))
            waves = [
                np.pad(w, (0, wave_target - wave_real)) for w in batch.waveform
            ]
        else:
            waves = batch.waveform
        # normalize over the REAL samples only, then zero-pad stays zero
        wave_np = process_audio(np.stack([w[:wave_real] for w in batch.waveform]))
        if dynamic:
            wave_np = np.pad(wave_np, ((0, 0), (0, wave_target - wave_real)))
        mask_time = None
        if augment and args.spec_augment:
            from said_tpu.models.wav2vec2 import compute_time_mask_indices

            mask_time = compute_time_mask_indices(
                (wave_np.shape[0], ws_real), rng=spec_rng
            )
            if dynamic and coeffs.shape[1] > ws_real:
                mask_time = np.pad(
                    mask_time, ((0, 0), (0, coeffs.shape[1] - ws_real))
                )
        # Replicate batches that don't divide the data axis (e.g. the
        # batch-1 validation loader) instead of erroring.
        from jax.sharding import NamedSharding, PartitionSpec as P

        # put_global handles multi-host meshes: every process builds the
        # same global batch (seed-synchronized loaders) and contributes
        # only its own rows via make_array_from_process_local_data.
        row = "data" if len(waves) % data_axis == 0 else None
        # sequence-parallel: shard the window (frame) axis over 'seq'
        # (the bucket is an lcm with the seq axis, so frames divide)
        frames_sharded = seq_axis > 1 and coeffs.shape[1] % seq_axis == 0
        coeff_spec = P(row, "seq", None) if frames_sharded else P(row)
        mask_spec = P(row, "seq") if frames_sharded else P(row)

        def put(x, spec):
            return put_global(x, NamedSharding(mesh, spec))

        out = {
            "waveform": put(wave_np, P(row)),
            "coeffs": put(coeffs.astype(np.float32), coeff_spec),
            "cond": put(batch.cond, P(row)),
        }
        if std is not None:
            out["std"] = std
        if batch.blendshape_delta is not None:
            out["blendshape_delta"] = put(
                batch.blendshape_delta.astype(np.float32), P(row)
            )
        if mask_time is not None:
            out["mask_time_indices"] = put(mask_time, mask_spec)
        if dynamic:
            out["window_real"] = jnp.asarray(ws_real, jnp.int32)
            out["input_length"] = jnp.asarray(wave_real, jnp.int32)
        return out

    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        totals: dict = {}
        count = 0
        # Batches are produced on a background thread (prefetch) and the
        # metric scalars of step N are read only AFTER step N+1 has been
        # dispatched — the device-to-host transfer then overlaps device
        # compute instead of stalling the loop once per step (each sync
        # is a full tunnel round-trip on remote-attached TPUs).
        pending = None
        for batch in prefetch(train_loader):
            rng, step_rng = jax.random.split(rng)
            state, metrics = train_step(state, prepare_batch(batch), step_rng)
            if pending is not None:
                p_metrics, p_bsz = pending
                for k, v in p_metrics.items():
                    totals[k] = totals.get(k, 0.0) + float(v) * p_bsz
                count += p_bsz
            pending = (metrics, len(batch.waveform))
        if pending is not None:
            p_metrics, p_bsz = pending
            for k, v in p_metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v) * p_bsz
            count += p_bsz

        logs = {f"Train/{k}": v / count for k, v in totals.items()}
        logs["Train/epoch_time_s"] = time.time() - t0

        if epoch % args.val_period == 0:
            # EMA weights overlay the full tree (ema_params covers only the
            # trainable subset; the frozen encoder comes from state.params)
            val_params = merge_trainable(state.params, state.ema_params)
            v_totals: dict = {}
            v_count = 0
            val_loader = DataLoader(
                val_dataset, batch_size=1, collate_fn=val_dataset.collate_fn
            )
            for _ in range(args.val_repeat):
                for batch in prefetch(val_loader):
                    rng, step_rng = jax.random.split(rng)
                    metrics = eval_step(
                        val_params,
                        prepare_batch(
                            batch,
                            bucket_size=args.val_window_bucket,
                            augment=False,
                        ),
                        step_rng,
                    )
                    bsz = len(batch.waveform)
                    for k, v in metrics.items():
                        v_totals[k] = v_totals.get(k, 0.0) + float(v) * bsz
                    v_count += bsz
            logs.update({f"Validation/{k}": v / v_count for k, v in v_totals.items()})

        writer.log(logs, epoch)
        print(f"epoch {epoch}: " + ", ".join(f"{k}={v:.5f}" for k, v in logs.items()))

        if epoch % args.save_period == 0:
            from said_tpu.core.checkpoint import save_train_state

            path = save_train_state(os.path.join(args.output_dir, "ckpt"), state, epoch)
            print(f"saved train state → {path}")
            if args.export_pth:
                from said_tpu.core.checkpoint import (
                    export_said_to_torch,
                    save_torch_state_dict,
                )

                # EMA weights, as the reference saves (train.py:648-659);
                # the .pth loads directly into the reference's SAID_UNet1D.
                export_params = merge_trainable(state.params, state.ema_params)
                sd = export_said_to_torch(
                    jax.tree_util.tree_map(np.asarray, export_params)
                )
                save_torch_state_dict(sd, os.path.join(args.output_dir, f"{epoch}.pth"))

    writer.close()


if __name__ == "__main__":
    main()
