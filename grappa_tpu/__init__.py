"""grappa_tpu: a TPU-native (JAX/XLA/Pallas) machine-learned molecular-
mechanics force-field framework with the capabilities of Grappa.

Core ideas vs. the reference (hits-mbm-dev/grappa, torch/DGL):
  * flat, statically-shaped, padded graph arrays + segment ids instead of
    dynamic DGL heterographs — everything jit-compiles once per size bucket
  * message passing via padded neighbor lists and masked attention instead of
    sparse CUDA kernels
  * forces via jax.grad of a jit-compiled MM energy; the training loss
    differentiates through the force (grad-of-grad)
  * data parallelism via jax.sharding meshes + shard_map, not a trainer flag
"""

__version__ = "0.1.0"

from grappa_tpu import constants, units

__all__ = ["constants", "units", "__version__"]
