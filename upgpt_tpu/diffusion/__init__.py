from upgpt_tpu.diffusion.schedule import (  # noqa: F401
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_schedule,
    DDIMSchedule,
)
