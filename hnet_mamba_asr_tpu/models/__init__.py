from hnet_mamba_asr_tpu.models.mamba2 import Mamba2  # noqa: F401
from hnet_mamba_asr_tpu.models.mamba_block import MambaBlock, MambaStack, reverse_sequences  # noqa: F401
