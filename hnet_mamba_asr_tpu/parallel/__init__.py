from hnet_mamba_asr_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, make_mesh, replicate, shard_batch,
)
