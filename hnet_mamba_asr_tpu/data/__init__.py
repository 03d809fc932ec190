from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer  # noqa: F401
