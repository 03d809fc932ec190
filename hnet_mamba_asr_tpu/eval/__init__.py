from hnet_mamba_asr_tpu.eval.metrics import (  # noqa: F401
    ErrorStats, char_error_rate, edit_distance, levenshtein_counts,
    normalize_text, real_time_factor, token_error_rate, word_error_rate,
)
from hnet_mamba_asr_tpu.eval.score import (  # noqa: F401
    bootstrap_split, gate_check, score_decode_dir, score_records,
)
