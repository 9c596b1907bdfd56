from multimodalsimilar_tpu.train.optim import (
    cosine_warm_restarts, dual_group_adamw, linear_schedule_with_warmup)
from multimodalsimilar_tpu.train.trainer import TrainState, Trainer, TrainerConfig
