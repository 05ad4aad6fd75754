"""Multi-device tests on the virtual 8-device CPU mesh: DP training step
equivalence, DP eval, conformer-axis sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grappa_tpu.data import MolGraph, collate
from grappa_tpu.data.graph_batch import PadSpec, TERMS
from grappa_tpu.data.synthetic import make_moldata
from grappa_tpu.models import mm_energy
from grappa_tpu.models.grappa_model import get_small_model_config, make_model
from grappa_tpu.parallel.dp import (
    make_conf_sharded_energy_fn, make_dp_eval_step, make_dp_train_step,
    make_mesh, shard_batches, stack_loss_weights)
from grappa_tpu.train.loss import LossWeights
from grappa_tpu.train.trainer import make_optimizer, make_train_step

N_DEV = 8


def _uniform_pad(graphs_per_dev):
    """One PadSpec covering every per-device batch so shapes match."""
    all_graphs = [g for gs in graphs_per_dev for g in gs]
    n_confs = max(g.n_confs for g in all_graphs)
    per_dev = [PadSpec.for_graphs(gs, n_confs) for gs in graphs_per_dev]
    return PadSpec(
        n_nodes=max(p.n_nodes for p in per_dev),
        n_tuples={t: max(p.n_tuples[t] for p in per_dev) for t in TERMS},
        n_confs=n_confs)


@pytest.fixture(scope='module')
def setup():
    assert len(jax.devices()) >= N_DEV
    graphs_per_dev = [
        [MolGraph.from_moldata(make_moldata(seed=10 * d + i, n_confs=4))
         for i in range(2)]
        for d in range(N_DEV)
    ]
    pad = _uniform_pad(graphs_per_dev)
    batches = [collate(gs, pad=pad) for gs in graphs_per_dev]
    stacked = shard_batches(batches)
    model = make_model(get_small_model_config())
    params = model.init(jax.random.key(0), batches[0])
    return model, params, batches, stacked


def _weights(m):
    return LossWeights(
        energy=jnp.float32(1.0), gradient=jnp.float32(0.8),
        param=jnp.full(m, 1e-3, jnp.float32),
        proper_reg=jnp.float32(1e-3), improper_reg=jnp.float32(1e-3))


def test_dp_train_step_matches_mean_of_grads(setup):
    """DP psum-averaged update == single-device update on the mean gradient.

    Uses plain SGD for the check: Adam's first-step m/sqrt(v) turns rounding
    noise on near-zero mean gradients into +-1 sign flips, which would make
    the comparison ill-conditioned without validating the collective math.
    """
    import optax as _optax
    model, params, batches, stacked = setup
    mesh = make_mesh(N_DEV)
    tx = _optax.chain(_optax.clip_by_global_norm(1e9), _optax.scale(-1.0))

    # donate=False: this test reuses `params` after the step (manual grads)
    dp_step = make_dp_train_step(model, tx, mesh, donate=False)
    opt_state = tx.init(params)
    weights = stack_loss_weights([_weights(b.num_mols) for b in batches])
    rngs = jax.random.split(jax.random.key(42), N_DEV)
    lr = jnp.float32(1e-3)

    # NOTE: dropout=0 in the small config, so rngs don't affect outputs
    new_params, _, dp_loss, dp_aux = dp_step(params, opt_state, stacked,
                                             weights, lr, rngs)
    assert 'energy_mse' in dp_aux      # aux metrics surface from the DP path

    # manual: average grads over the 8 batches on one device
    from grappa_tpu.train.loss import molwise_loss

    def loss_fn(p, batch, w):
        pred = model.apply(p, batch)
        return molwise_loss(batch, pred, w)[0]

    grads = [jax.grad(loss_fn)(params, b, _weights(b.num_mols))
             for b in batches]
    losses = [float(loss_fn(params, b, _weights(b.num_mols)))
              for b in batches]
    mean_grads = jax.tree.map(lambda *xs: sum(xs) / len(xs), *grads)
    import optax
    updates, _ = tx.update(mean_grads, tx.init(params), params)
    updates = jax.tree.map(lambda u: u * lr, updates)
    manual_params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(dp_loss), np.mean(losses), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(new_params),
                    jax.tree.leaves(manual_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=5e-5)


def test_dp_remainder_padding_equivalence(setup):
    """Zero-weight padding + n/k weight rescale: a partial group produces
    exactly the update the real batches would get alone (the trainer's
    trailing-group strategy, trainer._train_epoch_dp)."""
    import optax as _optax
    model, params, batches, _ = setup
    mesh = make_mesh(2)
    tx = _optax.chain(_optax.clip_by_global_norm(1e9), _optax.scale(-1.0))
    # donate=False: params/opt_state feed both the DP and the single step
    dp_step = make_dp_train_step(model, tx, mesh, donate=False)
    single_step = make_train_step(model, tx, donate=False)
    opt_state = tx.init(params)
    lr = jnp.float32(1e-3)
    rng = jax.random.key(7)

    real = batches[0]
    w_real = _weights(real.num_mols)
    # padded group: [real x2 weights, zero-weight replica]
    w_scaled = jax.tree.map(lambda x: x * 2.0, w_real)
    w_zero = jax.tree.map(jnp.zeros_like, w_real)
    stacked = shard_batches([real, real])
    weights = stack_loss_weights([w_scaled, w_zero])
    rngs = jax.random.split(rng, 2)
    dp_params, _, dp_loss, _ = dp_step(params, opt_state, stacked, weights,
                                       lr, rngs)

    ref_params, _, ref_loss, _ = single_step(params, opt_state, real, w_real,
                                             lr, rngs[0])
    np.testing.assert_allclose(float(dp_loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(dp_params), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6)


def test_dp_trainer_consumes_remainder():
    """Epoch batch count not divisible by the mesh: the trailing group still
    trains (step count = ceil(batches / n_dev)), loss finite."""
    from grappa_tpu.data.dataset import Dataset
    from grappa_tpu.data.loader import GraphLoader
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.train.trainer import Trainer

    ds = Dataset.from_moldata(make_dataset(n_mols=20, n_confs=4, seed=9),
                              'syn')
    loader = GraphLoader(ds, batch_size=2, conf_strategy=4, shuffle=True,
                         drop_last=True, seed=0)   # 10 batches, 8-dev mesh
    model = make_model(get_small_model_config())
    batch, _ = next(iter(loader))
    params = model.init(jax.random.key(0), batch)
    trainer = Trainer(model, params, loader, None,
                      {'lr': 3e-4, 'start_qm_epochs': 0, 'warmup_steps': 2,
                       'patience': 0},
                      {'max_epochs': 1}, out_dir=None, mesh=make_mesh(N_DEV))
    loss = trainer.train_epoch()
    assert np.isfinite(loss)
    assert trainer.global_step == 2     # 8 + remainder group of 2


def test_dp_eval_matches_single_device(setup):
    model, params, batches, stacked = setup
    mesh = make_mesh(N_DEV)
    dp_eval = make_dp_eval_step(model, mesh)
    energies, gradients = dp_eval(params, stacked)
    for d, b in enumerate(batches):
        pred = model.apply(params, b)
        e, g = mm_energy.energy_and_gradient(b, pred)
        np.testing.assert_allclose(np.asarray(energies)[d], np.asarray(e),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(gradients)[d], np.asarray(g),
                                   rtol=5e-3, atol=5e-3)


def test_conf_sharded_energy(setup):
    """Conformer-axis sharding returns the same energies as single-device.
    The conf axis must be divisible by the mesh size (validated error)."""
    model, params, batches, _ = setup
    mesh = make_mesh(N_DEV)
    with pytest.raises(ValueError, match="divisible"):
        pred4 = model.apply(params, batches[0])
        make_conf_sharded_energy_fn(mesh)(batches[0], pred4)  # 4 confs, 8 dev

    g = MolGraph.from_moldata(make_moldata(seed=77, n_confs=8))
    b = collate([g], n_confs=8)
    pred = model.apply(params, b)
    e_ref, g_ref = mm_energy.energy_and_gradient(b, pred)
    conf_fn = make_conf_sharded_energy_fn(mesh)
    e_sh, g_sh = conf_fn(b, pred)
    np.testing.assert_allclose(np.asarray(e_sh), np.asarray(e_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_dp_trainer_epoch():
    """Trainer(mesh=...) runs data-parallel epochs: loss finite and
    decreasing over a few epochs on the 8-device CPU mesh."""
    from grappa_tpu.data.dataset import Dataset
    from grappa_tpu.data.loader import GraphLoader
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.train.trainer import Trainer

    ds = Dataset.from_moldata(
        make_dataset(n_mols=32, n_confs=4, seed=3), 'syn')
    loader = GraphLoader(ds, batch_size=2, conf_strategy=4, shuffle=True,
                         drop_last=True, seed=0)  # 16 batches -> 2 DP steps
    model = make_model(get_small_model_config())
    batch, _ = next(iter(loader))
    params = model.init(jax.random.key(0), batch)
    mesh = make_mesh(N_DEV)
    trainer = Trainer(model, params, loader, None,
                      {'lr': 3e-4, 'start_qm_epochs': 0, 'warmup_steps': 2,
                       'patience': 0},
                      {'max_epochs': 4}, out_dir=None, mesh=mesh)
    l0 = trainer.train_epoch()
    trainer.epoch += 1
    for _ in range(3):
        l_last = trainer.train_epoch()
        trainer.epoch += 1
    assert np.isfinite(l0) and np.isfinite(l_last)
    assert l_last < l0


def test_dp_scan_trainer_curriculum_weights():
    """Regression (same as the single-device scan path): the DP-scan epoch
    must restack the epoch-dependent loss weights every epoch instead of
    freezing the epoch-0 curriculum (energy/gradient = 0) into the cache."""
    from grappa_tpu.data.dataset import Dataset
    from grappa_tpu.data.loader import GraphLoader
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.train.trainer import Trainer

    ds = Dataset.from_moldata(
        make_dataset(n_mols=20, n_confs=4, seed=7), 'syn')
    loader = GraphLoader(ds, batch_size=2, conf_strategy=4, shuffle=True,
                         drop_last=True, seed=0, fixed_pad=True)
    model = make_model(get_small_model_config())
    batch, _ = next(iter(loader))
    params = model.init(jax.random.key(0), batch)
    trainer = Trainer(model, params, loader, None,
                      {'lr': 3e-4, 'start_qm_epochs': 1, 'warmup_steps': 1,
                       'energy_weight': 1.0},
                      {'max_epochs': 2}, out_dir=None, mesh=make_mesh(N_DEV),
                      cache_batches=True, scan_epochs=True)

    captured = []
    orig = trainer.dp_scan_step

    def spy(p, o, b, w, scale, perm, lrs, rngs):
        captured.append(jax.tree.map(np.asarray, w))
        return orig(p, o, b, w, scale, perm, lrs, rngs)

    trainer.dp_scan_step = spy
    trainer.fit()
    assert len(captured) == 2
    assert captured[0].energy.max() == 0.0   # pre-QM epoch
    assert captured[1].energy.min() == 1.0   # QM phase on

    # non-uniform batch shapes must fail with the actionable message,
    # like the single-device scan path
    ragged = GraphLoader(ds, batch_size=2, conf_strategy=4, shuffle=True,
                         drop_last=True, seed=0, fixed_pad=False)
    t2 = Trainer(model, jax.tree.map(np.copy, trainer.params), ragged, None,
                 {'lr': 3e-4, 'start_qm_epochs': 0, 'warmup_steps': 1},
                 {'max_epochs': 1}, out_dir=None, mesh=make_mesh(N_DEV),
                 cache_batches=True, scan_epochs=True)
    with pytest.raises(ValueError, match='fixed_pad'):
        t2.train_epoch()


def test_atom_sharded_forward_matches_single_device():
    """Macromolecule path: node/tuple axes sharded over the mesh (GSPMD
    halo exchange) gives the same energies/forces as one device."""
    from grappa_tpu.parallel.sp import (atom_sharded_pad_spec,
                                        make_atom_sharded_forward,
                                        shard_batch_by_atoms)

    mesh = make_mesh(N_DEV)
    g = MolGraph.from_moldata(make_moldata(seed=5, n_confs=4, n_atoms=600))
    pad = atom_sharded_pad_spec([g], 4, mesh)
    batch = collate([g], pad=pad)
    model = make_model(get_small_model_config())
    params = model.init(jax.random.key(0), batch)
    pred = model.apply(params, batch)
    e_ref, g_ref = mm_energy.energy_and_gradient(batch, pred)

    sharded = shard_batch_by_atoms(batch, mesh)
    fwd = make_atom_sharded_forward(model, mesh)
    e, grad = fwd(params, sharded)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)

    odd_pad = PadSpec(n_nodes=pad.n_nodes + 2, n_tuples=pad.n_tuples,
                      n_confs=4)
    with pytest.raises(ValueError, match='divisible'):
        shard_batch_by_atoms(collate([g], pad=odd_pad), mesh)


def test_atom_sharded_md_matches_single_device():
    """On-device MD (grappa_tpu.md) on an atom-sharded macromolecule batch:
    GSPMD partitions the force computation inside the integrator scan, and
    the trajectory matches the single-device run — multi-chip dynamics for
    molecules past the single-chip HBM limit, with no MD-specific sharding
    code."""
    from grappa_tpu import md
    from grappa_tpu.parallel.sp import (atom_sharded_pad_spec,
                                        shard_batch_by_atoms)

    mesh = make_mesh(N_DEV)
    mdata = make_moldata(seed=6, n_confs=2, n_atoms=400, learnable=True,
                         conf_noise=0.05)
    g = MolGraph.from_moldata(mdata)
    pad = atom_sharded_pad_spec([g], 2, mesh)
    batch = collate([g], pad=pad)
    params = {
        'n2_k': jnp.nan_to_num(batch.terms['n2'].k_ref),
        'n2_eq': jnp.nan_to_num(batch.terms['n2'].eq_ref),
        'n3_k': jnp.nan_to_num(batch.terms['n3'].k_ref),
        'n3_eq': jnp.nan_to_num(batch.terms['n3'].eq_ref),
        'n4_k': jnp.nan_to_num(batch.terms['n4'].k_ref),
        'n4_improper_k': jnp.nan_to_num(batch.terms['n4_improper'].k_ref),
    }
    masses = md.masses_from_molecules([mdata.molecule], batch.xyz.shape[0])
    v0 = md.maxwell_boltzmann_velocities(batch, masses, 300.0,
                                         jax.random.key(4))
    ref = md.simulate(batch, params, masses, dt_fs=0.5, n_steps=10, v0=v0)

    sharded = shard_batch_by_atoms(batch, mesh)
    out = md.simulate(sharded, params, masses, dt_fs=0.5, n_steps=10,
                      v0=v0)
    np.testing.assert_allclose(np.asarray(out['potential']),
                               np.asarray(ref['potential']),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out['xyz']),
                               np.asarray(ref['xyz']),
                               rtol=2e-4, atol=2e-4)


def test_atom_sharded_train_step_matches_single_device():
    """Full TRAINING step (grad-of-grad through the forces) on a 5k-atom
    molecule sharded over the 8-device mesh == the single-device step:
    loss, updated params, and optimizer state. This is the prescribed path
    past the ~50k-atom single-chip HBM limit (PERF.md)."""
    import optax as _optax

    from grappa_tpu.parallel.sp import (atom_sharded_pad_spec,
                                        make_atom_sharded_train_step,
                                        shard_batch_by_atoms)

    mesh = make_mesh(N_DEV)
    g = MolGraph.from_moldata(make_moldata(seed=11, n_confs=2, n_atoms=5000))
    pad = atom_sharded_pad_spec([g], 2, mesh)
    batch = collate([g], pad=pad)
    model = make_model(get_small_model_config())
    params = model.init(jax.random.key(0), batch)
    tx = _optax.chain(_optax.clip_by_global_norm(1e9), _optax.scale(-1.0))
    opt_state = tx.init(params)
    weights = _weights(batch.num_mols)
    lr = jnp.float32(1e-3)
    rng = jax.random.key(3)

    ref_step = make_train_step(model, tx, donate=False)
    ref_params, _, ref_loss, ref_aux = ref_step(
        params, opt_state, batch, weights, lr, rng)

    sharded = shard_batch_by_atoms(batch, mesh)
    sp_step = make_atom_sharded_train_step(model, tx, mesh)
    sp_params, _, sp_loss, sp_aux = sp_step(
        params, opt_state, sharded, weights, lr, rng)

    # f32 reduction order differs across 8 shards; at 5k atoms the energy
    # sums are ~1e6, so a few 1e-4 relative is the expected noise floor
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sp_aux['gradient_mse']),
                               np.asarray(ref_aux['gradient_mse']), rtol=5e-3)
    for a, b in zip(jax.tree.leaves(sp_params), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_dp_scan_epoch_matches_looped_dp_steps(setup):
    """make_dp_scan_epoch_step (one dispatch per DP epoch) must equal the
    looped dp-step path with the same group assignment, including the
    trailing partial group's positional weight scaling + zero-padding."""
    import optax as _optax

    from grappa_tpu.data.graph_batch import stack_batches
    from grappa_tpu.parallel.dp import make_dp_scan_epoch_step

    model, params, batches, _ = setup
    mesh = make_mesh(N_DEV)
    tx = _optax.chain(_optax.clip_by_global_norm(1e9), _optax.scale(-1.0))

    # 11 real batches over 8 devices -> 2 groups, trailing k=3
    reals = (batches + batches[:3])[:11]
    n_real, n_dev = len(reals), N_DEV
    n_groups = -(-n_real // n_dev)
    n_slots = n_groups * n_dev
    k = n_real - (n_groups - 1) * n_dev
    base_w = [_weights(b.num_mols) for b in reals]
    lrs = jnp.asarray([1e-3, 5e-4], jnp.float32)
    rngs = jax.random.split(jax.random.key(5), n_slots).reshape(
        n_groups, n_dev)

    # reference: the Trainer loop's run_group semantics, group by group
    dp_step = make_dp_train_step(model, tx, mesh, donate=False)
    p_ref = params
    o_ref = tx.init(params)
    losses_ref = []
    for g in range(n_groups):
        grp = reals[g * n_dev:(g + 1) * n_dev]
        wts = [base_w[i] for i in range(g * n_dev,
                                        min((g + 1) * n_dev, n_real))]
        if len(grp) < n_dev:
            scale = jnp.float32(n_dev / len(grp))
            wts = [jax.tree.map(lambda x: x * scale, w) for w in wts]
            n_pad = n_dev - len(grp)
            for i in range(n_pad):
                grp.append(grp[i % len(grp)])
                wts.append(jax.tree.map(jnp.zeros_like, wts[i % k]))
        p_ref, o_ref, loss, _ = dp_step(
            p_ref, o_ref, shard_batches(grp), stack_loss_weights(wts),
            lrs[g], rngs[g])
        losses_ref.append(float(loss))

    # one scan dispatch with the identity permutation
    scan = make_dp_scan_epoch_step(model, tx, mesh, donate=False)
    slots_b = list(reals) + [reals[i % n_real]
                             for i in range(n_slots - n_real)]
    slots_w = base_w + [base_w[i % n_real]
                        for i in range(n_slots - n_real)]
    scale = np.ones(n_slots, np.float32)
    scale[(n_groups - 1) * n_dev:n_real] = n_dev / k
    scale[n_real:] = 0.0
    p_scan, o_scan, losses = scan(
        params, tx.init(params), stack_batches(slots_b),
        stack_loss_weights(slots_w), jnp.asarray(scale),
        jnp.arange(n_slots), lrs, rngs)

    np.testing.assert_allclose(np.asarray(losses), losses_ref, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_scan), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_flagship_config_sharded_steps(setup):
    """The deployed 40.8M default config must compile+execute under both dp
    and atom sharding (its param tree — 512-wide GNN, 4 tuple heads,
    fused 'auto' gates — differs structurally from the small config the
    other tests use). Tiny data shapes; the param tree is what's tested.
    Mirrors the flagship section of __graft_entry__.dryrun_multichip."""
    from grappa_tpu.models.grappa_model import get_default_model_config
    from grappa_tpu.parallel.sp import (
        atom_sharded_pad_spec, make_atom_sharded_train_step,
        shard_batch_by_atoms)

    _, _, batches, stacked = setup
    mesh = make_mesh(N_DEV)
    model = make_model(get_default_model_config())
    params = model.init(jax.random.key(7), batches[0])
    tx = make_optimizer()

    dp_step = make_dp_train_step(model, tx, mesh, donate=False)
    weights = stack_loss_weights([_weights(b.num_mols) for b in batches])
    _, _, loss, _ = dp_step(params, tx.init(params), stacked, weights,
                            jnp.float32(1e-4),
                            jax.random.split(jax.random.key(8), N_DEV))
    assert np.isfinite(float(loss))

    big = MolGraph.from_moldata(make_moldata(seed=77, n_confs=2, n_atoms=48))
    sp_batch = collate([big], pad=atom_sharded_pad_spec([big], 2, mesh))
    sharded = shard_batch_by_atoms(sp_batch, mesh)
    sp_step = make_atom_sharded_train_step(model, tx, mesh, donate=False)
    _, _, sp_loss, _ = sp_step(params, tx.init(params), sharded,
                               _weights(sp_batch.num_mols),
                               jnp.float32(1e-4), jax.random.key(9))
    assert np.isfinite(float(sp_loss))
