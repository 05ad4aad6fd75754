"""Top-level inference API: Molecule in, Parameters out.

The user-facing entry point mirroring the reference wrapper (reference:
src/grappa/grappa.py:14-58): load a model by tag/path, call
`predict(molecule)` to get classical MM bonded parameters. The forward pass
is jit-compiled; padded sizes are bucketed so repeated predictions on
similarly-sized molecules reuse the compiled program.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from grappa_tpu import topology
from grappa_tpu.data.graph_batch import MolGraph, collate
from grappa_tpu.data.loader import bucketed_pad_spec
from grappa_tpu.data.molecule import Molecule
from grappa_tpu.data.parameters import Parameters
from grappa_tpu.models.grappa_model import field_of_view


class Grappa:
    """Machine-learned MM force field: predicts bonded parameters."""

    def __init__(self, model, params, config: Optional[Dict] = None,
                 max_element: int = None, device=None):
        self.model = model
        self.params = params
        self.config = config or {}
        self._apply = jax.jit(
            lambda p, b: model.apply(p, b, deterministic=True))

    @classmethod
    def from_tag(cls, tag: str = 'latest') -> 'Grappa':
        """Load a published model by tag (e.g. 'grappa-1.2') or file path."""
        from grappa_tpu.zoo import model_path_from_tag
        from grappa_tpu.train.export import load_model_dict, model_from_dict
        model_dict = load_model_dict(model_path_from_tag(tag))
        model, params, config = model_from_dict(model_dict)
        return cls(model, params, config)

    @classmethod
    def from_model_dict(cls, model_dict: Dict) -> 'Grappa':
        from grappa_tpu.train.export import model_from_dict
        model, params, config = model_from_dict(model_dict)
        return cls(model, params, config)

    @property
    def field_of_view(self) -> int:
        """Graph distance influencing a predicted parameter (for partial
        re-parametrization, e.g. the kimmdy radical workflow)."""
        return field_of_view(self.config.get('model_config', self.config))

    def predict(self, molecule: Molecule,
                check_eq_values: bool = True) -> Parameters:
        return self.predict_many([molecule],
                                 check_eq_values=check_eq_values)[0]

    def predict_many(self, molecules, check_eq_values: bool = True,
                     batch_size: int = 32) -> list:
        """Parametrize a collection of molecules in batched forwards.

        TPU-first extension over the reference API (which runs one
        forward per molecule, grappa.py:36-58): up to `batch_size`
        molecules share one padded jit dispatch, and bucketed pad specs
        let differently-composed batches reuse compiled programs. Returns
        a list of `Parameters` aligned with the input order."""
        molecules = list(molecules)
        results = []
        for start in range(0, len(molecules), batch_size):
            chunk = molecules[start:start + batch_size]
            graphs = []
            for mol in chunk:
                if not topology.check_connected(mol.bonds_by_index(),
                                                len(mol.atoms)):
                    raise ValueError(
                        f"molecule #{start + len(graphs)}: the graph is "
                        "disconnected; split it into connected components "
                        "(water/ions are not parametrized by grappa)")
                graphs.append(MolGraph.from_molecule(mol))
            pad = bucketed_pad_spec(graphs, n_confs=1)
            batch = collate(graphs, pad=pad, n_confs=1)
            pred = {k: np.asarray(v)
                    for k, v in self._apply(self.params, batch).items()}
            # tuples are laid out contiguously per molecule (collate fills
            # in input order, padding at the tail) — slice by running
            # per-term offsets
            offsets = {'n2': 0, 'n3': 0, 'n4': 0, 'n4_improper': 0}
            for mol in chunk:
                counts = {'n2': len(mol.bonds), 'n3': len(mol.angles),
                          'n4': len(mol.propers),
                          'n4_improper': len(mol.impropers)}
                sliced = {}
                for key, v in pred.items():
                    t = ('n4_improper' if key.startswith('n4_improper')
                         else key.rsplit('_', 1)[0])
                    sliced[key] = v[offsets[t]:offsets[t] + counts[t]]
                for t in offsets:
                    offsets[t] += counts[t]
                results.append(Parameters.from_prediction(
                    mol, sliced, check_eq_values=check_eq_values))
        return results
