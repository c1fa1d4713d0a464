from upgpt_tpu.convert.torch_to_jax import (  # noqa: F401
    convert_unet_state_dict,
    convert_vae_state_dict,
    convert_linear_project_state_dict,
    split_ldm_checkpoint,
)
