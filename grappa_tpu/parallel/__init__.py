from grappa_tpu.parallel.dp import (
    make_mesh, make_dp_train_step, make_dp_eval_step, shard_batches,
    make_conf_sharded_energy_fn)

__all__ = [
    "make_mesh", "make_dp_train_step", "make_dp_eval_step", "shard_batches",
    "make_conf_sharded_energy_fn",
]
