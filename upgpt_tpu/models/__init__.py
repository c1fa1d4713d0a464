from upgpt_tpu.models.unet import UNetModel, UNetConfig  # noqa: F401
from upgpt_tpu.models.vae import (  # noqa: F401
    AutoencoderKL,
    AutoencoderConfig,
    DiagonalGaussian,
)
from upgpt_tpu.models.pose import LinearProject  # noqa: F401
