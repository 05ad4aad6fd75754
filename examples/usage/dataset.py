"""Datasets, splits and loaders (reference: examples/usage/dataset.py).

With released data in the cache, `Dataset.from_tag('spice-dipeptide')`
loads a benchmark set; without it this example builds a synthetic dataset
so it runs anywhere.
"""
from grappa_tpu.data.dataset import Dataset
from grappa_tpu.data.loader import GraphLoader

try:
    ds = Dataset.from_tag('spice-dipeptide')
    print("loaded spice-dipeptide from the cache")
except (FileNotFoundError, RuntimeError):   # not cached + offline
    from grappa_tpu.data.synthetic import make_dataset
    ds = Dataset.from_moldata(
        make_dataset(n_mols=32, n_confs=8, seed=0, learnable=True),
        'synthetic-demo')
    print("no cached data; built a 32-molecule synthetic dataset")

print(f"{len(ds)} molecules; first mol_id: {ds.mol_ids[0]}")

# leak-safe split by molecule id (duplicates across subdatasets get one
# consistent partition — the reference's calc_split_ids semantics)
from grappa_tpu.data.dataset import calc_split_ids
split = calc_split_ids({'demo': ds.mol_ids}, partition=(0.8, 0.1, 0.1),
                       seed=0)
train, val, test = ds.split(split['train'], split['val'], split['test'])
print(f"split: {len(train)}/{len(val)}/{len(test)}")

# the loader pads to shared static shapes (one XLA compile per size bucket),
# samples conformers per the conf strategy, and can weight datasets
loader = GraphLoader(train, batch_size=8, conf_strategy=8, shuffle=True,
                     seed=0)
batch, ds_names = next(iter(loader))
print("batch:", batch.num_mols, "mols,", batch.num_nodes, "padded atoms,",
      batch.num_confs, "confs; from:", set(ds_names))

# save/load round-trip of the whole dataset directory
import tempfile
out = tempfile.mkdtemp(prefix='grappa_ds_')
ds.save(out)
again = Dataset.load(out)
assert again.mol_ids == ds.mol_ids
print("dataset dir round-trip OK:", out)
