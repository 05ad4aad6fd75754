"""Key-for-key audit of the reference `.pth` checkpoint contract.

`expected_reference_keys()` enumerates, from the reference module sources
(grappa.py:56-108, graph_attention.py:75-310, perm_equiv_transformer.py:
40-319, interaction_parameters.py:38-520, final_layer.py:11-97,
network_utils.py:20-133), every state_dict key a published grappa model
file contains. These tests pin:

  * export_state_dict emits exactly that key set (so our exports load
    strict into reference-shaped torch models),
  * the independent torch oracle (tests/torch_ref_model.py) registers
    exactly that key set — including the reference's Symmetriser
    permutations/prefactors buffers and the gnn.blocks.* aliases,
  * import_state_dict reports ALL missing keys at once, warns loudly on
    unconsumed keys, and refuses a checkpoint whose stored permutation
    conventions disagree with ours,
  * (skip-marked) the real grappa-1.2 `.pth` imports the moment the file
    is dropped into ~/.cache/grappa_tpu/models/ (zero egress here).
"""
import warnings
from pathlib import Path

import numpy as np
import pytest

import jax

from grappa_tpu.models.grappa_model import (get_default_model_config,
                                            get_small_model_config,
                                            make_model)
from grappa_tpu.train.torch_compat import (expected_reference_keys,
                                           export_state_dict,
                                           import_state_dict,
                                           stats_from_model)


def _small_export():
    from grappa_tpu.data import MolGraph, collate
    from grappa_tpu.data.synthetic import make_moldata
    cfg = get_small_model_config()
    model = make_model(cfg)
    batch = collate([MolGraph.from_moldata(make_moldata(seed=0, n_confs=2))])
    params = model.init(jax.random.key(0), batch)
    sd = export_state_dict(params, cfg, stats=stats_from_model(model))
    return cfg, sd


def test_export_keys_match_reference_manifest():
    cfg, sd = _small_export()
    expected = expected_reference_keys(cfg)
    assert set(sd) == expected, (
        f'export missing: {sorted(expected - set(sd))}; '
        f'export extra: {sorted(set(sd) - expected)}')


def test_torch_oracle_keys_match_reference_manifest_default_config():
    """The torch oracle at the DEPLOYED config registers exactly the keys
    the real grappa-1.2 .pth will contain (audit without the file)."""
    torch = pytest.importorskip('torch')
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    from torch_ref_model import TorchReferenceModel

    cfg = get_default_model_config()
    model = make_model(cfg)   # default statistics
    oracle = TorchReferenceModel(cfg, stats_from_model(model), in_feats=109)
    expected = expected_reference_keys(cfg)
    got = set(oracle.state_dict().keys())
    assert got == expected, (
        f'oracle missing: {sorted(expected - got)}; '
        f'oracle extra: {sorted(got - expected)}')


def test_import_reports_all_missing_keys():
    cfg, sd = _small_export()
    # avoid graph_module keys (fc has a documented fc_src fallback name)
    victims = [k for k in sorted(sd) if 'graph_module' not in k][:3]
    for v in victims:
        del sd[v]
    with pytest.raises(KeyError) as exc:
        import_state_dict(sd, cfg)
    for v in victims:
        assert v in str(exc.value), f'{v} not reported'


def test_import_warns_on_unconsumed_keys():
    cfg, sd = _small_export()
    import torch
    sd['parameter_writer.bond_writer.some_new_buffer'] = torch.zeros(3)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter('always')
        import_state_dict(sd, cfg)
    msgs = [str(w.message) for w in caught]
    assert any('some_new_buffer' in m for m in msgs), msgs


def test_import_rejects_foreign_permutation_convention():
    cfg, sd = _small_export()
    import torch
    key = ('parameter_writer.improper_writer.torsion_model'
           '.symmetriser.permutations')
    sd[key] = torch.tensor([[0, 1, 2, 3], [1, 0, 2, 3]], dtype=torch.int32)
    with pytest.raises(ValueError, match='permutation'):
        import_state_dict(sd, cfg)


def test_import_roundtrip_still_exact():
    cfg, sd = _small_export()
    with warnings.catch_warnings():
        warnings.simplefilter('error')        # no unconsumed keys allowed
        params, stats = import_state_dict(sd, cfg)
    sd2 = export_state_dict(params, cfg, stats=stats)
    for key in sd:
        a = sd[key].detach().numpy() if hasattr(sd[key], 'numpy') else sd[key]
        b = (sd2[key].detach().numpy() if hasattr(sd2[key], 'numpy')
             else sd2[key])
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-6, err_msg=key)


_REAL_PTH = Path.home() / '.cache' / 'grappa_tpu' / 'models' / 'grappa-1.2.pth'


@pytest.mark.skipif(not _REAL_PTH.exists(),
                    reason='real grappa-1.2.pth not in cache (zero egress); '
                           'drop the released file into '
                           '~/.cache/grappa_tpu/models/ to activate')
def test_real_grappa12_checkpoint_imports():
    """Activates the moment the published file lands in the cache."""
    from grappa_tpu.api import Grappa
    from grappa_tpu.data.synthetic import make_moldata
    g = Grappa.from_tag('grappa-1.2')
    pred = g.predict(make_moldata(seed=0, n_confs=1).molecule)
    assert len(pred.bonds) > 0
    assert np.all(np.asarray(pred.bond_k) > 0)
    assert np.all(np.asarray(pred.bond_eq) > 0)
