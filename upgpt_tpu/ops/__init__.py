from upgpt_tpu.ops.basic import (  # noqa: F401
    group_norm,
    silu,
    timestep_embedding,
    timestep_embedding_ddpm,
    nearest_upsample_2x,
)
from upgpt_tpu.ops.attention import multi_head_attention  # noqa: F401
