from grappa_tpu.data.molecule import Molecule
from grappa_tpu.data.parameters import Parameters
from grappa_tpu.data.moldata import MolData
from grappa_tpu.data.graph_batch import (
    GraphBatch, MolGraph, PadSpec, TermBatch, collate, stack_batches,
)

__all__ = [
    "Molecule", "Parameters", "MolData", "GraphBatch", "MolGraph",
    "PadSpec", "TermBatch", "collate", "stack_batches",
]
