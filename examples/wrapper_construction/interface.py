"""Building your own MD-engine interface (reference:
examples/wrapper_construction/interface.py + load_model.py).

Everything an engine integration needs is `Grappa.predict`: build a
Molecule from your engine's topology (ids can be your engine's atom
numbers), predict, and write the returned Parameters back in your format.
The GROMACS/OpenMM/kimmdy wrappers in grappa_tpu/wrappers are just this
pattern; units are kcal/mol, Angstrom, radian (signed torsion phases 0/pi).
"""
import numpy as np

from grappa_tpu.api import Grappa
from grappa_tpu.data import Molecule

# 1. load a model: by tag ('grappa-1.2', cached), or a local .pth/.npz.
#    Here: a freshly initialized small model so the example runs anywhere.
try:
    ff = Grappa.from_tag('grappa-1.2')
except Exception:
    import jax
    from grappa_tpu.data.graph_batch import MolGraph, collate
    from grappa_tpu.data.synthetic import random_molecule
    from grappa_tpu.models.grappa_model import (get_small_model_config,
                                                make_model)
    model = make_model(get_small_model_config())
    batch = collate([MolGraph.from_molecule(random_molecule(seed=0))],
                    n_confs=1)
    ff = Grappa(model, model.init(jax.random.key(0), batch),
                {'model_config': get_small_model_config()})
    print("no cached release model; using a random small model")

# 2. your engine's topology -> Molecule (ids = your atom numbers)
mol = Molecule(
    atoms=[10, 11, 12, 13, 14, 15],
    bonds=[(10, 11), (11, 12), (12, 13), (11, 14), (12, 15)],
    impropers=[],
    atomic_numbers=[1, 6, 6, 1, 8, 8],
    partial_charges=[0.05, -0.1, -0.1, 0.05, 0.05, 0.05],
)

# 3. predict MM parameters; tuples come back in your id space
params = ff.predict(mol, check_eq_values=False)
for bond, eq, k in zip(params.bonds, params.bond_eq, params.bond_k):
    print(f"bond {tuple(bond)}: eq={eq:.3f} A  k={k:.1f} kcal/mol/A^2")
print("proper ks (signed-phase convention):",
      np.round(params.proper_ks[:2], 3))

# 4. partial reparametrization: restrict writes to the neighborhood of
#    changed atoms using the model's field of view (see
#    wrappers/gromacs_wrapper.fov_neighborhood for the reference logic)
print("field of view (bond hops):", ff.field_of_view)
