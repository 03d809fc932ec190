from hnet_mamba_asr_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, fsdp_specs, make_mesh, place_params, replicate,
    shard_batch,
)
from hnet_mamba_asr_tpu.parallel.seq_parallel import (  # noqa: F401
    SPModel, sp_encode, sp_loss_fn,
)
