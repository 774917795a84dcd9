"""Model definitions: UNet1D denoiser, Wav2Vec2 audio encoder, BCVAE, SAID."""

from said_tpu.models.unet1d import UNet1DConditionModel, timestep_embedding
from said_tpu.models.vae import BCVAE
from said_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

__all__ = [
    "UNet1DConditionModel",
    "timestep_embedding",
    "BCVAE",
    "Wav2Vec2Config",
    "Wav2Vec2Encoder",
]
