from hnet_mamba_asr_tpu.training.loss import HybridLossWeights, combine_losses  # noqa: F401
from hnet_mamba_asr_tpu.training.optim import build_optimizer, build_schedule  # noqa: F401
from hnet_mamba_asr_tpu.training.trainer import Trainer  # noqa: F401
