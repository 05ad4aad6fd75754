"""Misc feature coverage: radical flags in the model input, laplacian PE,
plotting, conf strategies, release CLI gating."""
import jax
import numpy as np
import pytest

from grappa_tpu.data import MolGraph, collate
from grappa_tpu.data.synthetic import make_moldata, random_molecule
from grappa_tpu.graph_features import laplacian_positional_encoding
from grappa_tpu.models.grappa_model import get_small_model_config, make_model


def test_radical_feature_changes_prediction():
    """A model configured with is_radical input must react to radical flags
    (the radical-peptide/kimmdy use case)."""
    cfg = get_small_model_config()
    cfg['in_feat_name'] = ['atomic_number', 'partial_charge', 'ring_encoding',
                           'degree', 'charge_model', 'is_radical']
    model = make_model(cfg)

    md = make_moldata(seed=0, n_confs=2)
    batch = collate([MolGraph.from_moldata(md)])
    params = model.init(jax.random.key(0), batch)
    out_plain = model.apply(params, batch)

    md.molecule.set_radical_flags(
        np.eye(len(md.molecule.atoms))[0])  # first atom radical
    batch_rad = collate([MolGraph.from_moldata(md)])
    out_rad = model.apply(params, batch_rad)
    diff = np.abs(np.asarray(out_plain['n2_k']) - np.asarray(out_rad['n2_k']))
    assert diff.max() > 1e-6


def test_laplacian_pe_properties():
    bonds = [(0, 1), (1, 2), (2, 3), (3, 0)]  # 4-ring
    pe = laplacian_positional_encoding(bonds, 4, k=3)
    assert pe.shape == (4, 3)
    assert np.isfinite(pe).all()
    # deterministic
    pe2 = laplacian_positional_encoding(bonds, 4, k=3)
    np.testing.assert_array_equal(pe, pe2)


def test_plotting_smoke(tmp_path):
    from grappa_tpu.data.synthetic import random_parameters
    from grappa_tpu.plotting import compare_parameters, plot_parameters
    mol = random_molecule(seed=1)
    p1 = random_parameters(mol, 1)
    p2 = random_parameters(mol, 2)
    plot_parameters(p1, filename=str(tmp_path / 'p.png'))
    compare_parameters(p1, p2, filename=str(tmp_path / 'c.png'))
    assert (tmp_path / 'p.png').stat().st_size > 1000
    assert (tmp_path / 'c.png').stat().st_size > 1000


def test_plotting_detailed(tmp_path):
    """Reference-layout panels (signed per-periodicity torsion ks, degrees,
    exclude_idxs, violin comparison) render and filter correctly."""
    from grappa_tpu.data.synthetic import random_parameters
    from grappa_tpu.plotting import (_detailed_panels,
                                     compare_parameters_detailed,
                                     plot_parameters_detailed)
    mol = random_molecule(seed=1)
    p1 = random_parameters(mol, 1)
    p2 = random_parameters(mol, 2)
    compare_parameters_detailed(p1, p2, filename=str(tmp_path / 'cd.png'),
                                density=True)
    plot_parameters_detailed(p1, compare=p2,
                             filename=str(tmp_path / 'pd.png'))
    assert (tmp_path / 'cd.png').stat().st_size > 1000
    assert (tmp_path / 'pd.png').stat().st_size > 1000

    # panel math: signed k folds phase pi into negative k; angles in degrees
    panels = _detailed_panels([p1])
    signed = np.where(p1.proper_phases[:, 0] > 1.0, -p1.proper_ks[:, 0],
                      p1.proper_ks[:, 0])
    np.testing.assert_allclose(panels['torsion_k1'], signed)
    np.testing.assert_allclose(panels['angle_eq'],
                               p1.angle_eq * 180.0 / np.pi)
    # exclude_idxs drops bonds/angles touching the given atoms
    excl = np.asarray(p1.bonds)[0]
    filtered = _detailed_panels([p1], exclude_idxs=[excl])
    keep = ~np.isin(np.asarray(p1.bonds), excl).any(axis=1)
    assert len(filtered['bond_eq']) == keep.sum()
    np.testing.assert_allclose(filtered['bond_eq'], p1.bond_eq[keep])

    # mismatched tuple sets (e.g. classical impropers store only assigned
    # versions): the panel is annotated instead of aborting the plot stage
    mol3 = random_molecule(seed=3)
    p3 = random_parameters(mol3, 3)
    compare_parameters_detailed(p1, p3, filename=str(tmp_path / 'mm.png'))
    assert (tmp_path / 'mm.png').stat().st_size > 1000


def test_conf_strategies():
    from grappa_tpu.data.dataset import Dataset
    from grappa_tpu.data.loader import GraphLoader
    from grappa_tpu.data.synthetic import make_dataset
    mds = make_dataset(n_mols=4, n_confs=6, seed=5)
    mds[0].xyz = mds[0].xyz[:3]  # heterogeneous conf counts
    mds[0].energy = mds[0].energy[:3]
    mds[0].gradient = mds[0].gradient[:3]
    mds[0].energy_ref = mds[0].energy_ref[:3]
    mds[0].gradient_ref = mds[0].gradient_ref[:3]
    mds[0].ff_energy = {'qm': mds[0].energy}
    mds[0].ff_gradient = {'qm': mds[0].gradient}
    ds = Dataset.from_moldata(mds, 'x')
    for strategy, expect in ((3, 3), ('min', 3), ('max', 6), ('mean', 5)):
        loader = GraphLoader(ds, batch_size=4, conf_strategy=strategy,
                             shuffle=False, conf_bucket_base=1,
                             pad_ratio=1.0001)
        batch, _ = next(iter(loader))
        # bucketing rounds up to >= expected count
        assert batch.num_confs >= expect
        # valid-conf accounting respects each molecule's true count
        counts = np.asarray(batch.conf_mask).sum(axis=1)
        assert counts[0] == min(3, batch.num_confs)


def test_fused_torsion_in_energy_path():
    """mm_energy with use_fused_torsion (interpret-equivalent jnp fallback is
    exercised on CPU via the kernel's custom-vjp wrapper on TPU only, so here
    we check the flag wiring raises nothing and the reference path agrees
    with itself)."""
    from grappa_tpu.models import mm_energy
    import jax.numpy as jnp
    md = make_moldata(seed=3, n_confs=3)
    batch = collate([MolGraph.from_moldata(md)])
    params = {
        'n2_k': jnp.nan_to_num(batch.terms['n2'].k_ref),
        'n2_eq': jnp.nan_to_num(batch.terms['n2'].eq_ref),
        'n3_k': jnp.nan_to_num(batch.terms['n3'].k_ref),
        'n3_eq': jnp.nan_to_num(batch.terms['n3'].eq_ref),
        'n4_k': jnp.nan_to_num(batch.terms['n4'].k_ref),
        'n4_improper_k': jnp.nan_to_num(batch.terms['n4_improper'].k_ref),
    }
    e1, g1 = mm_energy.energy_and_gradient(batch, params)
    assert np.isfinite(np.asarray(e1)).all()


def test_learnable_statistics():
    """learnable_statistics=True turns scaler stats into trainable params
    that receive gradients (reference: final_layer.py learnable mean/std)."""
    import jax.numpy as jnp
    from grappa_tpu.train.loss import LossWeights, molwise_loss

    cfg = get_small_model_config()
    cfg['learnable_statistics'] = True
    model = make_model(cfg)
    md = make_moldata(seed=0, n_confs=3)
    batch = collate([MolGraph.from_moldata(md)])
    params = model.init(jax.random.key(0), batch)
    p = params['params']
    assert 'k_mean' in p['bond_writer'] and 'k_std' in p['bond_writer']
    assert 'k_std' in p['proper_writer']

    w = LossWeights(energy=jnp.float32(1.0), gradient=jnp.float32(0.8),
                    param=jnp.zeros(1), proper_reg=jnp.float32(0.0),
                    improper_reg=jnp.float32(0.0))
    grads = jax.grad(
        lambda p: molwise_loss(batch, model.apply(p, batch), w)[0])(params)
    g = grads['params']['bond_writer']['k_mean']
    assert float(np.abs(np.asarray(g))) > 0

    # default config: statistics are NOT parameters
    model2 = make_model(get_small_model_config())
    params2 = model2.init(jax.random.key(0), batch)
    assert 'k_mean' not in params2['params']['bond_writer']


def test_units_reflected_division():
    """1/ps and scalar/Quantity — the openmm inverse-unit idioms."""
    from grappa_tpu.units import picosecond, nanometer, Quantity

    freq = 1.0 / picosecond
    assert isinstance(freq, Quantity)
    assert freq.unit.dims == tuple(-d for d in picosecond.dims)
    q = Quantity(2.0, nanometer)
    inv = 4.0 / q
    assert np.isclose(inv.value, 2.0)
    assert inv.unit.dims == tuple(-d for d in nanometer.dims)


def test_report_escapes_latex_and_markdown():
    from grappa_tpu.train.report import markdown_table, tex_table
    results = {'my_model': {'spice_pubchem': {
        'rmse_energies': 2.0, 'crmse_gradients': 6.0}}}
    tex = tex_table(results)
    assert 'my\\_model' in tex and 'spice\\_pubchem' in tex
    md = markdown_table(results)
    assert 'spice_pubchem' in md


def test_sweep_json_safe_inf():
    from grappa_tpu.train.sweep import _json_safe
    import json as _json
    rec = {'loss': float('inf'), 'nested': [float('nan'), 1.0],
           'ok': 2.5}
    s = _json.dumps(_json_safe(rec))
    assert 'Infinity' not in s and 'NaN' not in s
    assert _json.loads(s) == {'loss': None, 'nested': [None, 1.0],
                              'ok': 2.5}


def test_bufferless_model_dict_roundtrip(tmp_path):
    """A model_dict exported WITHOUT scaler buffers (model=None in
    build_model_dict) must load via the documented config fallback
    instead of raising KeyError (round-3 review regression)."""
    import jax
    from grappa_tpu.data import collate
    from grappa_tpu.models.grappa_model import (get_small_model_config,
                                                make_model)
    from grappa_tpu.train.export import (build_model_dict, load_model_dict,
                                         model_from_dict, save_model_dict)

    md = make_moldata(seed=5, n_confs=2)
    batch = collate([MolGraph.from_moldata(md)])
    cfg = {'model_config': get_small_model_config()}
    model = make_model(cfg['model_config'])
    params = jax.jit(model.init)(jax.random.key(0), batch)
    d = build_model_dict(params, cfg, split_names={}, results={})
    path = tmp_path / 'bufferless.npz'
    save_model_dict(d, path)
    model2, params2, _ = model_from_dict(load_model_dict(path))
    pred = model2.apply(params2, batch)
    assert np.isfinite(np.asarray(pred['n2_k'])).all()


def test_native_rejects_out_of_range_bonds():
    from grappa_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')
    with pytest.raises(IndexError):
        native.neighbor_list([(0, 5)], n_atoms=3, max_neighbors=4)
    with pytest.raises(IndexError):
        native.ring_encoding([(-1, 1)], n_atoms=3)


def test_bench_batch_cache_roundtrip(tmp_path, monkeypatch):
    """bench.py's disk cache must reproduce the batch exactly (same leaves,
    same static num_mols) and hit on the second call without rebuilding."""
    import bench

    monkeypatch.setattr(bench, '_CACHE_DIR', tmp_path)
    calls = {'n': 0}

    def build():
        calls['n'] += 1
        md = make_moldata(seed=7, n_confs=3)
        return collate([MolGraph.from_moldata(md)])

    b1 = bench._cached_batch('t', build)
    b2 = bench._cached_batch('t', build)
    assert calls['n'] == 1
    assert b2.num_mols == b1.num_mols
    for l1, l2 in zip(jax.tree.leaves(b1), jax.tree.leaves(b2)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    # a corrupt cache file is rebuilt, not fatal
    (tmp_path / f't_v{bench._CACHE_VERSION}.pkl').write_bytes(b'junk')
    b3 = bench._cached_batch('t', build)
    assert calls['n'] == 2
    assert b3.num_mols == b1.num_mols
