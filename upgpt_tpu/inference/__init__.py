from upgpt_tpu.inference.pipeline import (  # noqa: F401
    GenerationPipeline,
    mix_style,
    interpolate_smpl,
    interp_mask,
    prepare_lr_condition,
    STYLE_NAMES,
)
