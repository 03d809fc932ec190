from hnet_mamba_asr_tpu.tasks.asr_task import DCASRModel, build_model  # noqa: F401
