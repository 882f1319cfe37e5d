from diffusionremotesensing_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    is_main_process,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
