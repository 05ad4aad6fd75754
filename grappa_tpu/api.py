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
        if not topology.check_connected(molecule.bonds_by_index(),
                                        len(molecule.atoms)):
            raise ValueError(
                "the molecule graph is disconnected; split it into connected "
                "components (water/ions are not parametrized by grappa)")
        graph = MolGraph.from_molecule(molecule)
        pad = bucketed_pad_spec([graph], n_confs=1)
        batch = collate([graph], pad=pad, n_confs=1)
        pred = self._apply(self.params, batch)
        pred_np = {}
        counts = {
            'n2_k': len(molecule.bonds), 'n2_eq': len(molecule.bonds),
            'n3_k': len(molecule.angles), 'n3_eq': len(molecule.angles),
            'n4_k': len(molecule.propers),
            'n4_improper_k': len(molecule.impropers),
        }
        for key, v in pred.items():
            pred_np[key] = np.asarray(v)[:counts[key]]
        return Parameters.from_prediction(molecule, pred_np,
                                          check_eq_values=check_eq_values)
