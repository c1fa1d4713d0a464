from upgpt_tpu.utils.diagnostics import (  # noqa: F401
    PhaseTimer,
    device_memory_stats,
    nan_guard,
    profile_trace,
    count_params,
)
