from grappa_tpu.wrappers.gromacs_topology import GromacsTopology
from grappa_tpu.wrappers.gromacs_wrapper import GromacsGrappa

__all__ = ["GromacsTopology", "GromacsGrappa"]
# OpenmmGrappa is intentionally not imported eagerly: openmm is optional.
