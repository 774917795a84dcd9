"""said_tpu — a TPU-native speech-driven 3D facial animation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of SAiD
(reference: yunik1004/SAiD): a conditional diffusion model that maps a
16 kHz mono waveform to a 60 fps sequence of 32 ARKit blendshape
coefficients, plus the surrounding training, evaluation, pseudo-GT
optimization, data, and rendering stack.

Layout
------
- ``said_tpu.diffusion`` — cosine noise schedule, DDIM stepping,
  classifier-free guidance, and the full sampler as one ``lax.scan``.
- ``said_tpu.models``    — UNet1D denoiser, Wav2Vec2 audio encoder, BCVAE.
- ``said_tpu.ops``       — attention (dense / banded-gather / Pallas flash),
  norms, resampling primitives.
- ``said_tpu.parallel``  — device mesh + sharding rules (dp now, tp-ready).
- ``said_tpu.data``      — BlendVOCA datasets, windowing, augmentation.
- ``said_tpu.train``     — optax train states, EMA, losses, pjit'd steps.
- ``said_tpu.eval``      — FD / WInD / multimodality / beat-consistency.
- ``said_tpu.optimize``  — box-constrained QP solver for pseudo-GT coeffs.
- ``said_tpu.utils``     — audio/CSV/mesh I/O, parsers, schedules.
- ``said_tpu.render``    — software rasterizer + video muxing (host-side).
- ``said_tpu.cli``       — flag-compatible entry points.
"""

__version__ = "0.1.0"
