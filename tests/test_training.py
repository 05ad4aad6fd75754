"""Training-stack tests: vectorized loss correctness + invariances, dataset
splitting, loader sampling, evaluator metrics, and a smoke training run
(loss must decrease on learnable synthetic targets)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grappa_tpu.data import MolGraph, collate
from grappa_tpu.data.dataset import Dataset, calc_split_ids
from grappa_tpu.data.loader import GraphLoader, bucket_size
from grappa_tpu.data.synthetic import make_dataset, make_moldata
from grappa_tpu.models import mm_energy
from grappa_tpu.models.grappa_model import get_small_model_config, make_model
from grappa_tpu.train.evaluator import StreamingEvaluator, early_stopping_loss
from grappa_tpu.train.loss import LossWeights, molwise_loss
from grappa_tpu.train.trainer import Trainer


def ref_params(batch):
    return {
        'n2_k': jnp.nan_to_num(batch.terms['n2'].k_ref),
        'n2_eq': jnp.nan_to_num(batch.terms['n2'].eq_ref),
        'n3_k': jnp.nan_to_num(batch.terms['n3'].k_ref),
        'n3_eq': jnp.nan_to_num(batch.terms['n3'].eq_ref),
        'n4_k': jnp.nan_to_num(batch.terms['n4'].k_ref),
        'n4_improper_k': jnp.nan_to_num(batch.terms['n4_improper'].k_ref),
    }


def unit_weights(num_mols, param=0.0):
    return LossWeights(
        energy=jnp.float32(1.0), gradient=jnp.float32(1.0),
        param=jnp.full(num_mols, param, jnp.float32),
        proper_reg=jnp.float32(0.0), improper_reg=jnp.float32(0.0))


def test_loss_zero_for_perfect_params():
    """With the exact generating parameters, energy+force loss ~ 0."""
    md = make_moldata(seed=0, n_confs=5)
    batch = collate([MolGraph.from_moldata(md)])
    pred = ref_params(batch)
    loss, aux = molwise_loss(batch, pred, unit_weights(1))
    assert float(loss) < 1e-4, float(loss)


def test_loss_param_term_nan_masked():
    """NaN reference parameters contribute zero to the parameter loss."""
    md = make_moldata(seed=1, n_confs=3)
    md.classical_parameters.bond_k[:] = np.nan
    md.classical_parameters.bond_eq[:] = np.nan
    batch = collate([MolGraph.from_moldata(md)])
    pred = ref_params(batch)
    weights = LossWeights(
        energy=jnp.float32(0.0), gradient=jnp.float32(0.0),
        param=jnp.ones(1), proper_reg=jnp.float32(0.0),
        improper_reg=jnp.float32(0.0))
    loss, aux = molwise_loss(batch, pred, weights)
    assert np.isfinite(float(loss))
    # perfect non-NaN params -> param loss 0
    assert float(loss) < 1e-10


def test_loss_torsion_periodicity_correction():
    """A model with fewer (or more) proper periodicities than the dataset's
    stored classical ks must still train: the reference truncates / zero-pads
    the ref ks to the model's shape (reference loss.py:170-182). This is the
    published 1.2/1.2.1 situation (n_periodicity_proper=3 model, 6-wide
    dataset ks)."""
    md = make_moldata(seed=3, n_confs=3)
    batch = collate([MolGraph.from_moldata(md)])
    weights = LossWeights(
        energy=jnp.float32(0.0), gradient=jnp.float32(0.0),
        param=jnp.ones(1), proper_reg=jnp.float32(0.0),
        improper_reg=jnp.float32(0.0))
    full = ref_params(batch)
    width = full['n4_k'].shape[1]
    assert width >= 2

    # model narrower than the dataset: ref is truncated -> perfect on the
    # kept columns means zero loss
    narrow = dict(full)
    narrow['n4_k'] = full['n4_k'][:, :width - 1]
    loss_narrow, _ = molwise_loss(batch, narrow, weights)
    assert float(loss_narrow) < 1e-10, float(loss_narrow)

    # model wider than the dataset: ref is zero-padded -> a nonzero
    # prediction in the extra column is penalized
    wide = dict(full)
    extra = jnp.full((full['n4_k'].shape[0], 1), 0.5)
    wide['n4_k'] = jnp.concatenate([full['n4_k'], extra], axis=1)
    md6 = make_moldata(seed=3, n_confs=3)
    batch6 = collate([MolGraph.from_moldata(md6)])
    loss_wide, _ = molwise_loss(batch6, wide, weights)
    # tiny because of the n4_k type weight (1e-4), but strictly nonzero
    assert float(loss_wide) > 1e-11, float(loss_wide)


def test_loss_batch_equals_mean_of_singles():
    """Molwise loss of a batch == mean of single-molecule losses
    (the reference's equal-weight-per-molecule semantics)."""
    mds = [make_moldata(seed=s, n_confs=4) for s in (0, 1, 2)]
    graphs = [MolGraph.from_moldata(md) for md in mds]

    def perturbed(batch):
        p = ref_params(batch)
        p = dict(p)
        p['n2_k'] = p['n2_k'] * 1.1
        p['n4_k'] = p['n4_k'] + 0.05
        return p

    batch = collate(graphs, n_confs=4)
    loss_batch, _ = molwise_loss(batch, perturbed(batch), unit_weights(3, 0.01))
    singles = []
    for g in graphs:
        b = collate([g], n_confs=4)
        l, _ = molwise_loss(b, perturbed(b), unit_weights(1, 0.01))
        singles.append(float(l))
    np.testing.assert_allclose(float(loss_batch), np.mean(singles),
                               rtol=1e-4)


def test_split_consistency():
    ids = {'ds_a': [f'm{i}' for i in range(20)],
           'ds_b': [f'm{i}' for i in range(10, 30)]}
    split = calc_split_ids(ids, (0.8, 0.1, 0.1), seed=0)
    all_assigned = split['train'] + split['val'] + split['test']
    assert len(all_assigned) == len(set(all_assigned))  # disjoint
    assert set(all_assigned) == {f'm{i}' for i in range(30)}  # complete
    # deterministic
    split2 = calc_split_ids(ids, (0.8, 0.1, 0.1), seed=0)
    assert split == split2
    # forced partitions
    split3 = calc_split_ids({'x': ['a', 'b']}, {'x': (0.0, 0.0, 1.0)})
    assert set(split3['test']) == {'a', 'b'}


def test_dataset_split_and_roundtrip(tmp_path):
    mds = make_dataset(n_mols=6, n_confs=3, seed=1)
    ds = Dataset.from_moldata(mds, 'syn')
    split = calc_split_ids({'syn': ds.mol_ids}, (0.5, 0.25, 0.25), seed=0)
    tr, vl, te = ds.split(split['train'], split['val'], split['test'])
    assert len(tr) + len(vl) + len(te) == len(ds)
    ds.save(tmp_path / 'ds')
    ds2 = Dataset.load(tmp_path / 'ds')
    assert len(ds2) == len(ds)
    assert ds2.mol_ids == ds.mol_ids
    assert ds2.ds_names == ds.ds_names


def test_loader_shapes_and_weighting():
    mds = make_dataset(n_mols=12, n_confs=6, seed=2, ds_name='a')
    mds2 = make_dataset(n_mols=4, n_confs=6, seed=3, ds_name='b')
    ds = Dataset(mds + mds2, ['a'] * 12 + ['b'] * 4)
    loader = GraphLoader(ds, batch_size=4, conf_strategy=4, shuffle=True,
                         weights={'b': 3.0}, seed=0)
    counts = {'a': 0, 'b': 0}
    for batch, names in loader:
        assert batch.num_confs >= 4
        assert batch.num_mols == 4
        for n in names:
            counts[n] += 1
    # weight 3 on the 4 'b' mols: expected b share = 12/(12+12) = 0.5
    assert counts['b'] > 4  # upweighted vs its natural 4/16 share


def test_bucket_size_ladder():
    assert bucket_size(1, 64) == 64
    assert bucket_size(64, 64) == 64
    assert bucket_size(65, 64) == 80
    sizes = {bucket_size(x, 64) for x in range(1, 1000)}
    assert len(sizes) < 15  # bounded compile count


def test_evaluator_metrics():
    mds = [make_moldata(seed=s, n_confs=4) for s in (5, 6)]
    batch = collate([MolGraph.from_moldata(md) for md in mds], n_confs=4)
    pred = ref_params(batch)
    energy, gradient = mm_energy.energy_and_gradient(batch, pred)
    ev = StreamingEvaluator()
    ev.step(batch, energy, gradient, ['dsA', 'dsB'])
    metrics = ev.pool()
    assert metrics['dsA']['rmse_energies'] < 1e-2
    assert metrics['dsB']['rmse_gradients'] < 1e-2
    assert np.isclose(metrics['dsA']['crmse_gradients'],
                      metrics['dsA']['rmse_gradients'] / np.sqrt(3))
    assert early_stopping_loss(metrics) < 1e-1
    # offset energies -> rmse reflects it (and centering removes constants)
    ev.step(batch, energy + 7.0, gradient, ['dsA', 'dsA'])
    m2 = ev.pool()
    assert m2['dsA']['rmse_energies'] < 1e-2  # constant shift is centered out


def test_evaluator_batch_size_invariance():
    """The reference's batching-correctness oracle (reference tests/
    unbatch.py:10-28): pooled metrics from one big batch equal those from
    per-molecule batches, with an IMPERFECT model (nonzero residuals), so
    conf-mask handling and segment pooling are exercised for real."""
    mds = [make_moldata(seed=s, n_confs=3 + (s % 3)) for s in range(6)]

    def perturbed(batch, seed):
        p = ref_params(batch)
        key = jax.random.key(seed)
        out = {}
        for i, (k, v) in enumerate(sorted(p.items())):
            noise = jax.random.normal(jax.random.fold_in(key, i), v.shape)
            out[k] = v * (1.0 + 0.05 * noise) + 0.01 * noise
        return out

    # one batch of six (padded to common conf count)
    big = collate([MolGraph.from_moldata(md) for md in mds], n_confs=5)
    energy, gradient = mm_energy.energy_and_gradient(big, perturbed(big, 7))
    ev_big = StreamingEvaluator()
    ev_big.step(big, energy, gradient, ['ds'] * 6)
    m_big = ev_big.pool()

    # six batches of one, different padding, same parameter perturbation
    # (fold_in per-tensor is shape-dependent, so perturb the big batch once
    # and slice per-molecule predictions out of it)
    pred_big = perturbed(big, 7)
    ev_one = StreamingEvaluator()
    for i, md in enumerate(mds):
        single = collate([MolGraph.from_moldata(md)], n_confs=5)
        pred = {}
        for term in ('n2', 'n3', 'n4', 'n4_improper'):
            sel = np.asarray(big.terms[term].mol) == i
            for key in ([f'{term}_k', f'{term}_eq'] if term in ('n2', 'n3')
                        else [f'{term}_k']):
                vals = np.asarray(pred_big[key])[sel]
                n = int(np.asarray(single.terms[term].mask).sum())
                padded = np.zeros((single.terms[term].idxs.shape[0],)
                                  + vals.shape[1:], vals.dtype)
                padded[:n] = vals[:n]
                pred[key] = jnp.asarray(padded)
        e1, g1 = mm_energy.energy_and_gradient(single, pred)
        ev_one.step(single, e1, g1, ['ds'])
    m_one = ev_one.pool()

    for key in ('rmse_energies', 'rmse_gradients', 'crmse_gradients'):
        np.testing.assert_allclose(m_one['ds'][key], m_big['ds'][key],
                                   rtol=1e-4, err_msg=key)


@pytest.mark.slow
def test_training_smoke(tmp_path):
    """End-to-end smoke training: loss decreases on learnable targets
    (reference gate: single-dataset training smoke, SURVEY build plan #5)."""
    mds = make_dataset(n_mols=8, n_confs=6, seed=4)
    ds = Dataset.from_moldata(mds, 'syn')
    loader = GraphLoader(ds, batch_size=4, conf_strategy=6, shuffle=True,
                         seed=0, drop_last=True)
    val_loader = GraphLoader(ds, batch_size=4, conf_strategy=6, shuffle=False)

    model = make_model(get_small_model_config())
    batch, _ = next(iter(loader))
    params = model.init(jax.random.key(0), batch)

    lit_cfg = {
        'lr': 2e-4, 'start_qm_epochs': 1, 'warmup_steps': 5,
        'energy_weight': 1.0, 'gradient_weight': 0.8, 'param_weight': 1e-3,
        'proper_regularisation': 1e-3, 'improper_regularisation': 1e-3,
        'patience': 50, 'lr_decay': 0.8,
    }
    trainer = Trainer(model, params, loader, val_loader, lit_cfg,
                      {'max_epochs': 10, 'gradient_clip_val': 10.0,
                       'checkpoint_every': 5},
                      out_dir=str(tmp_path / 'run'))
    trainer.fit(max_epochs=10)
    losses = [h['early_stopping_loss'] for h in trainer.history
              if np.isfinite(h['early_stopping_loss'])]
    assert len(losses) >= 5
    assert losses[-1] < losses[0], (losses[0], losses[-1])

    # checkpoint roundtrip restores parameters exactly
    trainer2 = Trainer(model, params, loader, val_loader, lit_cfg,
                       {'max_epochs': 1}, out_dir=None)
    trainer2.load_checkpoint(tmp_path / 'run' / 'last.ckpt')
    leaves1 = jax.tree.leaves(trainer.params)
    leaves2 = jax.tree.leaves(trainer2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plateau_decay_keeps_monotone_best(tmp_path, monkeypatch):
    """After an LR plateau decay, a later epoch that is worse than the global
    best must NOT overwrite best.ckpt (the reference's checkpoint callback
    monitors a monotone best, lightning_trainer.py:53-84), while the patience
    counter measures progress against the post-decay baseline."""
    from grappa_tpu.train import trainer as trainer_mod

    losses = [10.0, 12.0, 13.0,  # decay triggers after epoch 2 (patience 1)
              11.0,              # beats post-decay baseline, NOT global best
              9.0]               # new global best
    trainer = Trainer(model=None, params={'w': jnp.zeros(1)},
                      train_loader=None, val_loader=None,
                      lit_config={'lr': 1e-3, 'start_qm_epochs': 0,
                                  'patience': 1, 'lr_decay': 0.5},
                      trainer_config={'checkpoint_every': 1},
                      out_dir=str(tmp_path / 'run'))
    monkeypatch.setattr(trainer, 'train_epoch', lambda: None)
    monkeypatch.setattr(trainer, 'validate',
                        lambda: {'es': losses[trainer.epoch]})
    monkeypatch.setattr(trainer_mod, 'early_stopping_loss',
                        lambda metrics, w: metrics['es'])
    best_saves = []
    real_save = trainer.save_checkpoint
    monkeypatch.setattr(
        trainer, 'save_checkpoint',
        lambda path, include_opt_state=True, **kw: (
            best_saves.append((trainer.epoch, losses[trainer.epoch])) or True
            if str(path).endswith('best.ckpt')
            else real_save(path, include_opt_state, **kw)))
    trainer.fit(max_epochs=len(losses))

    assert trainer.best_loss == 9.0
    # the LR decayed exactly once (after epochs 1,2 exhausted patience 1)
    assert trainer.lr == pytest.approx(5e-4)
    # best.ckpt saved only on true global improvements: epochs 0 and 4.
    # epoch 3 (post-decay 11.0 < baseline 13.0 but > global best 10.0)
    # must not appear.
    assert best_saves == [(0, 10.0), (4, 9.0)]
    # resume restores both trackers
    meta = __import__('json').loads(
        (tmp_path / 'run' / 'last.ckpt' / 'meta.json').read_text())
    assert meta['best_loss'] == 9.0
    assert meta['plateau_baseline'] == 9.0


def test_early_exit_counts_completed_epoch(tmp_path):
    """A finish_criterion/time_limit exit happens AFTER an epoch completed;
    the final checkpoint must record that epoch so a resume does not retrain
    it (meta['epoch'] == number of completed epochs == len(history))."""
    import json

    mds = make_dataset(n_mols=4, n_confs=4, seed=6)
    ds = Dataset.from_moldata(mds, 'syn')
    loader = GraphLoader(ds, batch_size=2, conf_strategy=4, shuffle=True,
                         seed=0, drop_last=True)
    val_loader = GraphLoader(ds, batch_size=2, conf_strategy=4,
                             shuffle=False)
    model = make_model(get_small_model_config())
    batch, _ = next(iter(loader))
    params = model.init(jax.random.key(0), batch)

    lit_cfg = {'lr': 2e-4, 'start_qm_epochs': 0, 'warmup_steps': 2,
               'time_limit': 1e-9}     # exit after the first epoch
    trainer = Trainer(model, params, loader, val_loader, lit_cfg,
                      {'max_epochs': 10, 'checkpoint_every': 1},
                      out_dir=str(tmp_path / 'run'))
    out = trainer.fit()
    done = len(out['history'])
    assert done >= 1
    assert trainer.epoch == done
    meta = json.loads(
        (tmp_path / 'run' / 'last.ckpt' / 'meta.json').read_text())
    assert meta['epoch'] == done


def test_loader_guards_and_fixed_pad_with_replacement():
    """Round-3 review regressions: (a) bucket_size must progress for
    ratio <= 1.0, (b) weighted/balanced sampling requires shuffle,
    (c) pad_ratio < 1 is rejected, (d) fixed_pad's worst-case spec must
    survive weighted sampling drawing the LARGEST molecule batch_size
    times (sampling is with replacement)."""
    assert bucket_size(100, 8, ratio=1.0) >= 100   # no infinite loop

    mds_small = make_dataset(n_mols=6, n_confs=4, seed=8, ds_name='small',
                             atom_range=(6, 10))
    mds_big = make_dataset(n_mols=1, n_confs=4, seed=9, ds_name='big',
                           atom_range=(40, 44))
    ds = Dataset(mds_small + mds_big, ['small'] * 6 + ['big'])

    with pytest.raises(ValueError):
        GraphLoader(ds, shuffle=False, balance_factor=0.5)
    with pytest.raises(ValueError):
        GraphLoader(ds, shuffle=False, weights={'big': 2.0})
    with pytest.raises(ValueError):
        GraphLoader(ds, pad_ratio=0.9)

    # weights make the single big molecule dominate draws; every batch
    # must fit the one fixed spec even when it contains the big molecule
    # batch_size times
    loader = GraphLoader(ds, batch_size=3, conf_strategy=4, shuffle=True,
                         weights={'big': 100.0}, seed=0, drop_last=True)
    big_atoms = mds_big[0].xyz.shape[1]
    spec = loader._fixed_pad_spec(4)
    assert spec.n_nodes >= 3 * big_atoms
    for _ in range(3):   # several epochs of weighted draws
        for batch, names in loader:
            assert batch.num_mols == 3


def test_loader_abandoned_iterator_joins_producer():
    """Breaking out of an epoch early must not leave the prefetch thread
    blocked on the queue (leaked batches + RNG races with the next
    epoch's producer)."""
    import threading

    mds = make_dataset(n_mols=10, n_confs=4, seed=10)
    ds = Dataset.from_moldata(mds, 'syn')
    loader = GraphLoader(ds, batch_size=2, conf_strategy=4, shuffle=True,
                         seed=0)
    before = set(threading.enumerate())
    it = iter(loader)
    next(it)
    it.close()          # abandon mid-epoch -> generator finally must join
    leaked = [t for t in set(threading.enumerate()) - before if t.is_alive()]
    assert not leaked, leaked
    # and the next epoch still works end to end
    assert sum(1 for _ in loader) == len(loader)


def test_scan_epoch_matches_loop():
    """make_scan_epoch_step (one dispatch per epoch) must produce exactly
    the same params/opt_state/losses as the per-step loop given the same
    batch order, per-step LRs and dropout keys."""
    import jax.numpy as jnp
    from grappa_tpu.data.graph_batch import stack_batches
    from grappa_tpu.data.loader import GraphLoader
    from grappa_tpu.train.loss import LossWeights
    from grappa_tpu.train.trainer import (make_optimizer,
                                          make_scan_epoch_step,
                                          make_train_step)

    mds = make_dataset(n_mols=6, n_confs=4, seed=12)
    ds = Dataset.from_moldata(mds, 'syn')
    loader = GraphLoader(ds, batch_size=2, conf_strategy=4, shuffle=True,
                         seed=0, drop_last=True)
    cfg = get_small_model_config()
    cfg['gnn_dropout_attention'] = 0.2     # exercise the rng plumbing
    model = make_model(cfg)
    pairs = list(loader)
    batch0 = pairs[0][0]
    params = model.init(jax.random.key(0), batch0)
    tx = make_optimizer()
    opt_state = tx.init(params)

    n = len(pairs)
    w = [LossWeights(energy=jnp.float32(1.0), gradient=jnp.float32(0.8),
                     param=jnp.full(b.num_mols, 1e-3, jnp.float32),
                     proper_reg=jnp.float32(1e-3),
                     improper_reg=jnp.float32(1e-3)) for b, _ in pairs]
    lrs = jnp.asarray([1e-3, 5e-4, 2e-4][:n], jnp.float32)
    rngs = jax.random.split(jax.random.key(7), n)
    perm = jnp.asarray([2, 0, 1][:n])

    # explicit loop in permuted order
    step = make_train_step(model, tx, donate=False)
    p_ref, o_ref = params, opt_state
    losses_ref = []
    for t in range(n):
        i = int(perm[t])
        p_ref, o_ref, loss, _ = step(p_ref, o_ref, pairs[i][0], w[i],
                                     lrs[t], rngs[t])
        losses_ref.append(float(loss))

    # one scan dispatch
    scan = make_scan_epoch_step(model, tx, donate=False)
    stacked_b = stack_batches([b for b, _ in pairs])
    stacked_w = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *w)
    p_scan, o_scan, losses = scan(params, opt_state, stacked_b, stacked_w,
                                  perm, lrs, rngs)

    np.testing.assert_allclose(np.asarray(losses), losses_ref, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_scan), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_trainer_scan_epochs_smoke(tmp_path):
    """Trainer(scan_epochs=True): fit runs, losses are finite, validation
    and checkpointing work; requires cache_batches."""
    mds = make_dataset(n_mols=8, n_confs=4, seed=13, learnable=True,
                       conf_noise=0.08)
    ds = Dataset.from_moldata(mds, 'syn')
    loader = GraphLoader(ds, batch_size=4, conf_strategy=4, shuffle=True,
                         seed=0, drop_last=True)
    val_loader = GraphLoader(ds, batch_size=4, conf_strategy=4,
                             shuffle=False)
    model = make_model(get_small_model_config())
    batch, _ = next(iter(loader))
    params = model.init(jax.random.key(0), batch)
    lit_cfg = {'lr': 2e-4, 'start_qm_epochs': 0, 'warmup_steps': 2}

    with pytest.raises(ValueError, match='cache_batches'):
        Trainer(model, params, loader, val_loader, lit_cfg,
                {'max_epochs': 1}, scan_epochs=True)

    trainer = Trainer(model, params, loader, val_loader, lit_cfg,
                      {'max_epochs': 2, 'checkpoint_every': 1},
                      out_dir=str(tmp_path / 'run'),
                      cache_batches=True, scan_epochs=True)
    out = trainer.fit()
    assert len(out['history']) == 2
    assert np.isfinite(out['best_early_stopping_loss'])
    assert trainer.global_step == 2 * len(list(loader))
    assert (tmp_path / 'run' / 'last.ckpt' / 'params.msgpack').exists()


def test_trainer_scan_epochs_curriculum_weights(tmp_path):
    """Regression: the scan path must restack loss weights every epoch —
    they are epoch-dependent (start_qm_epochs curriculum, param_loss_epochs
    switch-off). A once-built cache trains the whole run with the epoch-0
    weights (energy/gradient = 0), silently fitting classical params only."""
    mds = make_dataset(n_mols=6, n_confs=4, seed=17, learnable=True,
                       conf_noise=0.08)
    ds = Dataset.from_moldata(mds, 'syn')
    loader = GraphLoader(ds, batch_size=3, conf_strategy=4, shuffle=True,
                         seed=0, drop_last=True)
    model = make_model(get_small_model_config())
    batch, _ = next(iter(loader))
    params = model.init(jax.random.key(0), batch)
    lit_cfg = {'lr': 2e-4, 'start_qm_epochs': 1, 'warmup_steps': 1,
               'param_loss_epochs': 2, 'energy_weight': 1.0,
               'gradient_weight': 0.8}
    trainer = Trainer(model, params, loader, None, lit_cfg,
                      {'max_epochs': 3}, out_dir=str(tmp_path / 'run'),
                      cache_batches=True, scan_epochs=True)

    captured = []
    orig = trainer.scan_step

    def spy(p, o, b, w, perm, lrs, rngs):
        captured.append(jax.tree.map(np.asarray, w))
        return orig(p, o, b, w, perm, lrs, rngs)

    trainer.scan_step = spy
    trainer.fit()
    assert len(captured) == 3
    # epoch 0: pre-QM phase — energy/gradient off, param loss on
    assert captured[0].energy.max() == 0.0
    assert captured[0].gradient.max() == 0.0
    assert captured[0].param.min() > 0.0
    # epoch 1: QM phase on
    assert captured[1].energy.min() == 1.0
    assert captured[1].gradient.min() > 0.0
    # epoch 2: param loss switched off (param_loss_epochs=2)
    assert captured[2].param.max() == 0.0
    assert captured[2].energy.min() == 1.0


def test_async_checkpointing(tmp_path, monkeypatch):
    """async_checkpoints: non-blocking saves write IDENTICAL files to the
    sync path, skip-if-busy returns False without stalling, errors surface
    on the next save/join, and fit's final last.ckpt is always on disk
    before fit returns (blocking)."""
    import threading
    import time as time_mod
    from grappa_tpu.train import trainer as trainer_mod

    mds = make_dataset(n_mols=4, n_confs=3, seed=23, learnable=True)
    ds = Dataset.from_moldata(mds, 'syn')
    loader = GraphLoader(ds, batch_size=2, conf_strategy=3, shuffle=True,
                         seed=0, drop_last=True)
    model = make_model(get_small_model_config())
    batch, _ = next(iter(loader))
    params = model.init(jax.random.key(0), batch)
    lit_cfg = {'lr': 2e-4, 'start_qm_epochs': 0, 'warmup_steps': 1}

    trainer = Trainer(model, params, loader, None, lit_cfg,
                      {'max_epochs': 1, 'async_checkpoints': True},
                      out_dir=str(tmp_path / 'run'), cache_batches=True)
    assert trainer.async_checkpoints

    # async and sync writes produce byte-identical checkpoint payloads
    assert trainer.save_checkpoint(tmp_path / 'a.ckpt') is True   # async
    trainer._join_ckpt_thread()
    trainer.save_checkpoint(tmp_path / 'b.ckpt', blocking=True)
    from flax import serialization
    for name in ('params.msgpack', 'opt_state.msgpack'):
        ta = serialization.msgpack_restore(
            (tmp_path / 'a.ckpt' / name).read_bytes())
        tb = serialization.msgpack_restore(
            (tmp_path / 'b.ckpt' / name).read_bytes())
        la, lb = jax.tree.leaves(ta), jax.tree.leaves(tb)
        assert len(la) == len(lb), name
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # no tmp litter
    assert not list((tmp_path / 'a.ckpt').glob('*.tmp'))

    # skip-if-busy: block the writer and request another save
    release = threading.Event()
    real_write = trainer_mod._write_checkpoint

    def slow_write(path, p, o, meta):
        release.wait(timeout=10)
        real_write(path, p, o, meta)

    monkeypatch.setattr(trainer_mod, '_write_checkpoint', slow_write)
    assert trainer.save_checkpoint(tmp_path / 'c.ckpt') is True
    assert trainer.save_checkpoint(tmp_path / 'd.ckpt') is False  # busy
    release.set()
    trainer._join_ckpt_thread()
    assert (tmp_path / 'c.ckpt' / 'meta.json').exists()
    assert not (tmp_path / 'd.ckpt').exists()

    # a failing background write surfaces on the next join
    def bad_write(path, p, o, meta):
        raise OSError('disk gone')

    monkeypatch.setattr(trainer_mod, '_write_checkpoint', bad_write)
    assert trainer.save_checkpoint(tmp_path / 'e.ckpt') is True
    time_mod.sleep(0.05)
    with pytest.raises(RuntimeError, match='async checkpoint'):
        trainer._join_ckpt_thread()
    monkeypatch.setattr(trainer_mod, '_write_checkpoint', real_write)

    # fit with async on: final last.ckpt is blocking -> present + loadable
    out = trainer.fit(max_epochs=1)
    assert len(out['history']) == 1
    trainer2 = Trainer(model, params, loader, None, lit_cfg,
                       {'max_epochs': 1}, out_dir=None)
    trainer2.load_checkpoint(tmp_path / 'run' / 'last.ckpt')
    assert trainer2.epoch == 1


def test_best_ckpt_flushed_at_fit_exit(tmp_path, monkeypatch):
    """If the last improvement's best-save is skipped (async writer busy /
    throttle window) and no later improvement occurs, fit() must still
    flush the TRUE best params (device-held snapshot) to best.ckpt at exit
    — not silently lose them (VERDICT r4 weak #6)."""
    from grappa_tpu.train import trainer as trainer_mod

    mds = make_dataset(n_mols=4, n_confs=3, seed=31, learnable=True)
    ds = Dataset.from_moldata(mds, 'syn')
    loader = GraphLoader(ds, batch_size=2, conf_strategy=3, shuffle=True,
                         seed=0, drop_last=True)
    model = make_model(get_small_model_config())
    batch, _ = next(iter(loader))
    params = model.init(jax.random.key(0), batch)
    lit_cfg = {'lr': 2e-4, 'start_qm_epochs': 0, 'warmup_steps': 1}

    # scripted es_loss: best at epoch 1, regression at epoch 2. With the
    # default checkpoint_every=5 throttle, epoch 0's save succeeds
    # (_last_best_save=0) and epoch 1's improvement is throttle-skipped —
    # exactly the window where the best params used to be lost.
    losses = iter([5.0, 4.0, 10.0])
    monkeypatch.setattr(trainer_mod, 'early_stopping_loss',
                        lambda metrics, w: next(losses))
    trainer = Trainer(model, params, loader, None, lit_cfg,
                      {'max_epochs': 3, 'async_checkpoints': True},
                      out_dir=str(tmp_path / 'run'), cache_batches=True)
    trainer.fit(max_epochs=3)

    import json
    best = tmp_path / 'run' / 'best.ckpt'
    meta = json.loads((best / 'meta.json').read_text())
    assert meta['epoch'] == 1                 # the flush, not epoch 0's save
    assert meta['best_loss'] == 4.0
    # flushed params are the epoch-1 snapshot, not the (newer) final params
    from flax import serialization
    saved = serialization.msgpack_restore((best / 'params.msgpack')
                                          .read_bytes())
    final = jax.tree.leaves(trainer.params)
    stored = jax.tree.leaves(saved)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(stored, final))
    # best.ckpt is params-only
    assert not (best / 'opt_state.msgpack').exists()


def test_torn_checkpoint_detected(tmp_path):
    """A crash between the per-file atomic replaces leaves a mixed
    checkpoint (params newer than meta/opt state). The manifest written
    last makes load_checkpoint detect this instead of silently resuming
    from mismatched state (ADVICE r4)."""
    mds = make_dataset(n_mols=2, n_confs=3, seed=37, learnable=True)
    ds = Dataset.from_moldata(mds, 'syn')
    loader = GraphLoader(ds, batch_size=2, conf_strategy=3, shuffle=True,
                         seed=0)
    model = make_model(get_small_model_config())
    batch, _ = next(iter(loader))
    params = model.init(jax.random.key(0), batch)
    trainer = Trainer(model, params, loader, None,
                      {'lr': 2e-4}, {'max_epochs': 1})
    trainer.save_checkpoint(tmp_path / 'x.ckpt', blocking=True)
    trainer.load_checkpoint(tmp_path / 'x.ckpt')   # intact: loads fine

    # simulate the torn state: params replaced by a newer save's bytes
    f = tmp_path / 'x.ckpt' / 'params.msgpack'
    f.write_bytes(f.read_bytes() + b'\x00')
    with pytest.raises(RuntimeError, match='torn'):
        trainer.load_checkpoint(tmp_path / 'x.ckpt')


def test_fit_exception_joins_async_writer(tmp_path, monkeypatch):
    """If fit() raises mid-run, the in-flight async checkpoint writer must
    be joined before the exception propagates — an orphaned daemon thread
    could otherwise clobber a resumed run's newer last.ckpt with stale
    state (ADVICE r4 medium)."""
    import time as time_mod
    from grappa_tpu.train import trainer as trainer_mod

    mds = make_dataset(n_mols=4, n_confs=3, seed=41, learnable=True)
    ds = Dataset.from_moldata(mds, 'syn')
    loader = GraphLoader(ds, batch_size=2, conf_strategy=3, shuffle=True,
                         seed=0, drop_last=True)
    model = make_model(get_small_model_config())
    batch, _ = next(iter(loader))
    params = model.init(jax.random.key(0), batch)
    trainer = Trainer(model, params, loader, None,
                      {'lr': 2e-4, 'start_qm_epochs': 0},
                      {'max_epochs': 2, 'async_checkpoints': True},
                      out_dir=str(tmp_path / 'run'), cache_batches=True)

    real_write = trainer_mod._write_checkpoint

    def slow_write(path, p, o, meta):
        time_mod.sleep(0.3)
        real_write(path, p, o, meta)

    monkeypatch.setattr(trainer_mod, '_write_checkpoint', slow_write)
    # start an in-flight async write, then make the next epoch blow up
    assert trainer.save_checkpoint(tmp_path / 'run' / 'last.ckpt') is True
    assert trainer._ckpt_thread is not None and trainer._ckpt_thread.is_alive()
    monkeypatch.setattr(trainer, 'train_epoch',
                        lambda: (_ for _ in ()).throw(ValueError('boom')))
    with pytest.raises(ValueError, match='boom'):
        trainer.fit(max_epochs=2)
    # the writer was joined on the exception path — nothing in flight
    assert trainer._ckpt_thread is None
    assert (tmp_path / 'run' / 'last.ckpt' / 'meta.json').exists()


def test_scanned_validation_matches_loop(tmp_path):
    """validate() under scan_epochs (one dispatch for the whole val pass)
    must produce identical metrics to the per-batch loop."""
    mds = make_dataset(n_mols=8, n_confs=4, seed=29, learnable=True)
    ds = Dataset.from_moldata(mds, 'syn')
    loader = GraphLoader(ds, batch_size=4, conf_strategy=4, shuffle=True,
                         seed=0, drop_last=True)
    # two separate val loaders: the scan path flips its loader to fixed_pad
    # (uniform shapes), the loop keeps per-batch buckets — metric equality
    # across the two also proves padding-insensitivity of the evaluator
    val_scan = GraphLoader(ds, batch_size=4, conf_strategy=4, shuffle=False)
    val_loop = GraphLoader(ds, batch_size=4, conf_strategy=4, shuffle=False)
    model = make_model(get_small_model_config())
    batch, _ = next(iter(loader))
    params = model.init(jax.random.key(0), batch)
    lit_cfg = {'lr': 2e-4, 'start_qm_epochs': 0}

    t_scan = Trainer(model, params, loader, val_scan, lit_cfg,
                     {'max_epochs': 1}, cache_batches=True,
                     scan_epochs=True)
    # the trainer's LOCAL copy is flipped to fixed_pad (uniform shapes);
    # the caller-owned loader keeps its bucketed shapes (ADVICE r4)
    assert not val_scan.fixed_pad
    assert t_scan.val_loader is not val_scan and t_scan.val_loader.fixed_pad
    t_loop = Trainer(model, params, loader, val_loop, lit_cfg,
                     {'max_epochs': 1}, cache_batches=True,
                     scan_epochs=False)
    assert not val_loop.fixed_pad
    m_scan = t_scan.validate()
    m_loop = t_loop.validate()
    assert set(m_scan) == set(m_loop)
    for name in m_loop:
        for key in m_loop[name]:
            np.testing.assert_allclose(m_scan[name][key],
                                       m_loop[name][key], rtol=1e-5,
                                       err_msg=f'{name}/{key}')
    # the scan path was actually taken (cache built, not the fallback) and
    # the per-batch staging cache was dropped (the stacked copy alone stays
    # resident — keeping both would double val HBM, ADVICE r4)
    assert t_scan._val_scan_cache is not False
    assert t_scan._val_cache is None


def test_test_eval_fixed_pad_matches_bucketed():
    """The bootstrap test evaluation must be padding-invariant: a fixed
    worst-case PadSpec (one XLA program for the whole test pass — the
    tunneled-chip default in get_dataloaders) produces the same metrics as
    per-batch bucketed padding."""
    from grappa_tpu.train.eval_model import BootstrapEvaluator

    mds = make_dataset(n_mols=6, n_confs=5, seed=31, learnable=True)
    ds = Dataset.from_moldata(mds, 'syn')
    model = make_model(get_small_model_config())
    b0, _ = next(iter(GraphLoader(ds, batch_size=1, conf_strategy='max',
                                  shuffle=False)))
    params = model.init(jax.random.key(0), b0)

    def run_eval(fixed_pad):
        loader = GraphLoader(ds, batch_size=1, conf_strategy='max',
                             shuffle=False, fixed_pad=fixed_pad)
        ev = BootstrapEvaluator()
        for batch, names in loader:
            pred = model.apply(params, batch)
            energy, gradient = mm_energy.energy_and_gradient(batch, pred)
            ev.step(batch, energy, gradient, names)
        return ev.pool(n_bootstrap=50)

    m_fix, m_buck = run_eval(True), run_eval(False)
    assert set(m_fix) == set(m_buck)
    for name in m_buck:
        for key, v in m_buck[name].items():
            np.testing.assert_allclose(m_fix[name][key], v, rtol=1e-4,
                                       err_msg=f'{name}/{key}')
