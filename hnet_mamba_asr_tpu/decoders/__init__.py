from hnet_mamba_asr_tpu.decoders.ctc_decode import ctc_prefix_beam_search  # noqa: F401
from hnet_mamba_asr_tpu.decoders.joint import (  # noqa: F401
    CTCPrefixScorer, Hypothesis, joint_beam_search, joint_beam_search_nbest,
    joint_beam_search_nbest_lockstep, lm_rescore,
)
from hnet_mamba_asr_tpu.decoders.lm_scorer import CausalLMScorer  # noqa: F401
from hnet_mamba_asr_tpu.models.ctc_head import ctc_greedy_collapse, greedy_decode  # noqa: F401
