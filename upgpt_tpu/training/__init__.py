from upgpt_tpu.training.ema import EmaState, ema_init, ema_update, ema_decay  # noqa: F401
from upgpt_tpu.training.lr import lambda_linear_schedule, lambda_warmup_cosine  # noqa: F401
from upgpt_tpu.training.train_state import TrainState, create_train_state, train_step  # noqa: F401
