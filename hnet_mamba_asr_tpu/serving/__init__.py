"""Serving export: AOT StableHLO artifacts + self-contained runtime."""
from hnet_mamba_asr_tpu.serving.export import save_serving_artifact
from hnet_mamba_asr_tpu.serving.runtime import load_serving_artifact
