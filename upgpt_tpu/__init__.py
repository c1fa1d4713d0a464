"""upgpt_tpu — TPU-native person-image latent-diffusion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of soon-yau/upgpt
(ICCVW 2023 "UPGPT: Universal Diffusion Model for Person Image Generation,
Editing and Pose Transfer"): KL-f8/KL-f4 VAE latent space, SD-style U-Net with
hybrid conditioning (person-mask channel concat + cross-attention over CLIP
text / per-garment style / SMPL pose tokens), DDIM sampling as a single jitted
lax.scan program, pose/camera interpolation, style mixing, a chained 256->512
upscale stage, and data-parallel training over a `jax.sharding.Mesh`.

Everything is functional: models are flax.linen modules, parameters are
pytrees, RNG is threaded explicitly, and the compute path is NHWC/bfloat16
with fp32 islands where the reference forces fp32 (GroupNorm, softmax).
"""

__version__ = "0.1.0"

from upgpt_tpu.config import instantiate_from_config, load_config, merge_configs  # noqa: F401
