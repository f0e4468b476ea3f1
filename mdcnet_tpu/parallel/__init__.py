from mdcnet_tpu.parallel.sharding import (auto_mesh, batch_sharding,
                                          data_parallel_batch, make_mesh,
                                          param_specs, shard_params,
                                          shard_state)

__all__ = ["make_mesh", "auto_mesh", "shard_params", "shard_state",
           "param_specs", "batch_sharding", "data_parallel_batch"]
