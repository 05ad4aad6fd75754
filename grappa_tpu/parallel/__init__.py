from grappa_tpu.parallel.dp import (
    make_mesh, make_dp_train_step, make_dp_eval_step, shard_batches,
    make_conf_sharded_energy_fn)
from grappa_tpu.parallel.sp import (
    atom_sharded_pad_spec, make_atom_sharded_forward,
    make_atom_sharded_train_step, shard_batch_by_atoms)

__all__ = [
    "make_mesh", "make_dp_train_step", "make_dp_eval_step", "shard_batches",
    "make_conf_sharded_energy_fn", "atom_sharded_pad_spec",
    "make_atom_sharded_forward", "make_atom_sharded_train_step",
    "shard_batch_by_atoms",
]
