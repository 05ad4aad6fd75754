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

# lazy top-level API (PEP 562): `from grappa_tpu import OpenmmGrappa` works
# like the reference's `from grappa import OpenmmGrappa`, without importing
# jax (or any heavy dependency) until the name is actually touched
_LAZY = {
    "Grappa": ("grappa_tpu.api", "Grappa"),
    "OpenmmGrappa": ("grappa_tpu.wrappers.openmm_wrapper", "OpenmmGrappa"),
    "GromacsGrappa": ("grappa_tpu.wrappers.gromacs_wrapper", "GromacsGrappa"),
    "Molecule": ("grappa_tpu.data.molecule", "Molecule"),
    "MolData": ("grappa_tpu.data.moldata", "MolData"),
    "Parameters": ("grappa_tpu.data.parameters", "Parameters"),
    "Dataset": ("grappa_tpu.data.dataset", "Dataset"),
}

__all__ = ["constants", "units", "__version__", *_LAZY]


def __getattr__(name):
    if name in _LAZY:
        import importlib
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'grappa_tpu' has no attribute {name!r}")
