"""Evaluation VAE over blendshape-coefficient windows (BCVAE), in flax.

Architecture mirrors the reference BCVAE (``said/model/vae.py``):
encoder = 4 valid-padding Conv1d + BatchNorm/LeakyReLU → flatten → 3 FC
(+BatchNorm/LeakyReLU) → fc_mu / fc_logvar; decoder = 2 FC → unflatten
(4, seq_len) → 2 ConvTranspose1d + 2 Conv1d → ReLU → Tanh. 120-frame
windows of 32 coefficients, z_dim 64.

Channels-last layout; the stride-1 transposed convs are realized as
full-padding correlations with a flipped kernel (exact equivalence),
so the decoder is plain convs end-to-end. Pretrained torch weights
(``model/vae.pth``) import via
``said_tpu.utils.torch_import.convert_bcvae`` — including BatchNorm
running statistics, which eval mode uses.

Note: in training mode, batch statistics are used like torch; torch
updates running variance with the *unbiased* batch variance while flax
uses the biased one — a negligible train-time difference documented
here for auditability.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass
class BCVAEOutput:
    mean: jnp.ndarray
    log_var: jnp.ndarray
    latent: jnp.ndarray
    coeffs_reconst: jnp.ndarray


def _leaky(x, slope):
    return nn.leaky_relu(x, negative_slope=slope)


def _bn(name: str, x: jnp.ndarray, train: bool) -> jnp.ndarray:
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1)."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )(x)


class BCEncoder(nn.Module):
    in_channels: int = 32
    z_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coeffs: jnp.ndarray, train: bool = False):
        """coeffs (B, T, C) → (mean, log_var), each (B, z_dim)."""
        x = coeffs.astype(self.dtype)
        x = nn.Conv(32, (3,), padding="VALID", dtype=self.dtype, name="conv0")(x)
        x = _bn("bn0", x, train)
        x = _leaky(x, 0.2)
        x = nn.Conv(64, (3,), padding="VALID", dtype=self.dtype, name="conv1")(x)
        x = _bn("bn1", x, train)
        x = _leaky(x, 0.2)
        x = nn.Conv(64, (4,), strides=(2,), padding="VALID", dtype=self.dtype, name="conv2")(x)
        x = _bn("bn2", x, train)
        x = _leaky(x, 0.2)
        x = nn.Conv(32, (3,), padding="VALID", dtype=self.dtype, name="conv3")(x)

        # torch flattens (B, C, T) channel-major; transpose to match.
        b = x.shape[0]
        x = jnp.swapaxes(x, 1, 2).reshape(b, -1)

        x = nn.Dense(256, dtype=self.dtype, name="fc0")(x)
        x = _bn("fc_bn0", x, train)
        x = _leaky(x, 0.01)
        x = nn.Dense(128, dtype=self.dtype, name="fc1")(x)
        x = _bn("fc_bn1", x, train)
        x = _leaky(x, 0.01)
        x = nn.Dense(self.z_dim, dtype=self.dtype, name="fc2")(x)

        mean = nn.Dense(self.z_dim, dtype=self.dtype, name="fc_mu")(x)
        log_var = nn.Dense(self.z_dim, dtype=self.dtype, name="fc_logvar")(x)
        return mean, log_var


class BCDecoder(nn.Module):
    out_channels: int = 32
    seq_len: int = 120
    z_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, latent: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """latent (B, z_dim) → coeffs (B, seq_len, out_channels)."""
        x = nn.Dense(2 * self.seq_len, dtype=self.dtype, name="fc0")(latent)
        x = _bn("fc_bn0", x, train)
        x = _leaky(x, 0.01)
        x = nn.Dense(4 * self.seq_len, dtype=self.dtype, name="fc1")(x)

        # torch Unflatten(1, (4, seq_len)) then Conv1d on (B, 4, T):
        # reshape channel-major, then to channels-last.
        b = x.shape[0]
        x = x.reshape(b, 4, self.seq_len)
        x = jnp.swapaxes(x, 1, 2)  # (B, T, 4)

        # ConvTranspose1d(k=3, s=1) == full-padding conv with flipped kernel;
        # the flip is folded into the stored kernel at import/init time.
        x = nn.Conv(32, (3,), padding=2, dtype=self.dtype, name="deconv0")(x)
        x = _bn("bn0", x, train)
        x = _leaky(x, 0.2)
        x = nn.Conv(32, (3,), padding=2, dtype=self.dtype, name="deconv1")(x)
        x = _bn("bn1", x, train)
        x = _leaky(x, 0.2)
        x = nn.Conv(32, (3,), padding="VALID", dtype=self.dtype, name="conv0")(x)
        x = nn.Conv(self.out_channels, (3,), padding="VALID", dtype=self.dtype, name="conv1")(x)
        x = jnp.tanh(nn.relu(x))
        return x


class BCVAE(nn.Module):
    """VAE over 120-frame windows of 32 blendshape coefficients."""

    channels: int = 32
    seq_len: int = 120
    z_dim: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = BCEncoder(self.channels, self.z_dim, self.dtype)
        self.decoder = BCDecoder(self.channels, self.seq_len, self.z_dim, self.dtype)

    def __call__(
        self,
        coeffs: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        use_noise: bool = True,
        train: bool = False,
    ) -> BCVAEOutput:
        mean, log_var = self.encoder(coeffs, train)
        if use_noise:
            if rng is None:
                raise ValueError("use_noise=True requires an rng key")
            latent = self.reparametrize(rng, mean, log_var)
        else:
            latent = mean
        reconst = self.decoder(latent, train)
        return BCVAEOutput(mean=mean, log_var=log_var, latent=latent, coeffs_reconst=reconst)

    def encode(self, coeffs: jnp.ndarray, train: bool = False):
        return self.encoder(coeffs, train)

    def decode(self, latent: jnp.ndarray, train: bool = False):
        return self.decoder(latent, train)

    @staticmethod
    def reparametrize(rng: jax.Array, mean: jnp.ndarray, log_var: jnp.ndarray) -> jnp.ndarray:
        eps = jax.random.normal(rng, mean.shape, mean.dtype)
        return mean + jnp.exp(0.5 * log_var) * eps
