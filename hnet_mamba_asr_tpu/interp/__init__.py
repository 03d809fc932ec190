from hnet_mamba_asr_tpu.interp.boundary_align import (  # noqa: F401
    aggregate, match_boundaries, prf, r_value, score_utterances,
)
