from hnet_mamba_asr_tpu.ops.melspec import frame_count, log_mel_spectrogram, mel_filterbank  # noqa: F401
from hnet_mamba_asr_tpu.ops.specaug import spec_augment  # noqa: F401
