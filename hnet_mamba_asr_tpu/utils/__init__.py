from hnet_mamba_asr_tpu.utils.logging_utils import get_logger, setup_logging  # noqa: F401
