"""Serving export: AOT StableHLO artifacts + self-contained runtime/server."""
from hnet_mamba_asr_tpu.serving.export import (save_serving_artifact,
                                                save_streaming_artifact)
from hnet_mamba_asr_tpu.serving.runtime import (load_serving_artifact,
                                                 load_streaming_artifact,
                                                 load_streaming_pool)
