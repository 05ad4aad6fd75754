"""The model_dict contract (reference: examples/usage/inspect_models.py).

Published models are `.pth` files holding {state_dict, config, split_names,
results} — the full reproducibility contract. This example exports a fresh
(untrained) model to show the layout, then loads it back through the
inference API; with a released checkpoint in the cache, pass its tag
instead.
"""
import tempfile
from pathlib import Path

import jax

from grappa_tpu.api import Grappa
from grappa_tpu.data.graph_batch import MolGraph, collate
from grappa_tpu.data.synthetic import random_molecule
from grappa_tpu.models.grappa_model import get_small_model_config, make_model
from grappa_tpu.train.export import (build_model_dict, load_model_dict,
                                     save_model_dict)

cfg = get_small_model_config()
model = make_model(cfg)
batch = collate([MolGraph.from_molecule(random_molecule(seed=0))], n_confs=1)
params = model.init(jax.random.key(0), batch)

path = Path(tempfile.mkdtemp(prefix='grappa_model_')) / 'demo.npz'
md = build_model_dict(params, {'model_config': cfg}, model=model)
save_model_dict(md, path)

loaded = load_model_dict(path)
print("model_dict keys:", sorted(loaded))
print("config sections:", sorted(loaded['config']))
print("first state_dict entries (reference torch naming):")
for name in list(loaded['state_dict'])[:5]:
    print("  ", name, tuple(loaded['state_dict'][name].shape))

ff = Grappa.from_tag(str(path))           # tags and paths both work
out = ff.predict(random_molecule(seed=3), check_eq_values=False)
print("predicted bond_k shape:", out.bond_k.shape,
      "field of view:", ff.field_of_view)
