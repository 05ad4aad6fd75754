"""Execute the openmm-gated wrapper logic against the first-party double.

The real openmm cannot be installed here; tests/openmm_double.py implements
the exact API surface the wrappers use (with openmm's functional forms and
md-unit semantics), so every code path in grappa_tpu/wrappers/
openmm_wrapper.py and hyp_dop.py actually runs:

  * get_subtopology water/ion stripping with index-preserving atom ids
  * molecule_from_openmm: bonds/elements/charges/improper reconstruction
  * _classical_parameters_from_openmm: exact round-trip of the classical FF
  * write_to_system: in-place bond/angle overwrite, torsion zeroing, fresh
    grappa_torsions force — validated numerically against our jax MM energy
    (the identity oracle: fake-openmm energies == grappa_tpu energies)
  * moldata_from_openmm_system: nonbonded subtraction, training targets
  * OpenmmGrappa.parametrize_system end to end
  * hyp_dop.add_nonstandard_residue_bonds template + peptide bonds
"""
import numpy as np
import pytest

from grappa_tpu.constants import ATOMIC_MASSES, IMPROPER_CENTRAL_IDX
from grappa_tpu.data.molecule import Molecule
from grappa_tpu.data.parameters import Parameters
from grappa_tpu.data.synthetic import (
    embed_conformers, random_molecule, random_parameters)

import openmm_double


@pytest.fixture(scope='module', autouse=True)
def fake_openmm():
    openmm_double.install()
    yield
    openmm_double.uninstall()


# ---------------------------------------------------------------------------
# fixture builders
def build_topology(mol: Molecule, residue_name: str = 'MOL'):
    from openmm.app import Element, Topology
    top = Topology()
    chain = top.addChain('A')
    res = top.addResidue(residue_name, chain)
    atoms = [top.addAtom(f'X{i}', Element.getByAtomicNumber(int(z)), res)
             for i, z in enumerate(mol.atomic_numbers)]
    for a, b in mol.bonds_by_index():
        top.addBond(atoms[int(a)], atoms[int(b)])
    return top


def build_system(mol: Molecule, params: Parameters):
    """A fake-openmm System carrying the given classical parameters
    (grappa convention: E_bond = k/2 (r-r0)^2 matches openmm directly;
    torsion phases in {0, pi} with nonnegative ks)."""
    import openmm
    import openmm.unit as u
    kcal, ang, rad = (u.kilocalorie_per_mole, u.angstrom, u.radian)

    system = openmm.System()
    for z in mol.atomic_numbers:
        system.addParticle(ATOMIC_MASSES.get(int(z), 12.0))

    nonbonded = openmm.NonbondedForce()
    for q in mol.partial_charges:
        nonbonded.addParticle(float(q) * u.elementary_charge,
                              0.3 * u.nanometer,
                              0.1 * u.kilojoule_per_mole)
    # standard exclusions: 1-2 and 1-3 pairs interact via (zeroed) exceptions
    idx = mol.tuple_indices()
    for a, b in idx['n2']:
        nonbonded.addException(int(a), int(b), 0.0, 0.1 * u.nanometer, 0.0)
    for a, _, c in idx['n3']:
        nonbonded.addException(int(a), int(c), 0.0, 0.1 * u.nanometer, 0.0)
    system.addForce(nonbonded)

    bond_force = openmm.HarmonicBondForce()
    for i, (a, b) in enumerate(idx['n2']):
        bond_force.addBond(int(a), int(b),
                           float(params.bond_eq[i]) * ang,
                           float(params.bond_k[i]) * kcal / ang ** 2)
    system.addForce(bond_force)

    angle_force = openmm.HarmonicAngleForce()
    for i, (a, b, c) in enumerate(idx['n3']):
        angle_force.addAngle(int(a), int(b), int(c),
                             float(params.angle_eq[i]) * rad,
                             float(params.angle_k[i]) * kcal / rad ** 2)
    system.addForce(angle_force)

    torsion_force = openmm.PeriodicTorsionForce()
    for tuples, ks, phases in ((idx['n4'], params.proper_ks,
                                params.proper_phases),
                               (idx['n4_improper'], params.improper_ks,
                                params.improper_phases)):
        for i, t in enumerate(tuples):
            a, b, c, d = (int(x) for x in t)
            for n in range(ks.shape[1]):
                if np.isnan(ks[i, n]) or ks[i, n] == 0.0:
                    continue
                torsion_force.addTorsion(a, b, c, d, n + 1,
                                         float(phases[i, n]) * rad,
                                         float(ks[i, n]) * kcal)
    system.addForce(torsion_force)
    return system


@pytest.fixture(scope='module')
def mol_system():
    # seed chosen so no improper's atom set also forms a proper chain (the
    # proper-wins-in-4-rings rule would drop it on reconstruction — reference
    # semantics, shared by classify_torsions); charge_model matches the
    # wrapper default so predictions on the rebuilt molecule are identical
    mol = random_molecule(seed=12, n_atoms=14, charge_model='amber99')
    params = random_parameters(mol, seed=3)
    return mol, params, build_system(mol, params), build_topology(mol)


def improper_sets(impropers):
    """Order-insensitive view: (frozenset of atoms, central atom)."""
    return {(frozenset(map(int, t)), int(t[IMPROPER_CENTRAL_IDX]))
            for t in impropers}


# ---------------------------------------------------------------------------
def test_subtopology_strips_water_and_ions(mol_system):
    from openmm.app import Element
    from grappa_tpu.wrappers.openmm_wrapper import get_subtopology

    mol, _, _, _ = mol_system
    top = build_topology(mol)     # private copy: this test mutates it
    # append a water and an ion residue
    chain = top.addChain('W')
    wat = top.addResidue('HOH', chain)
    o = top.addAtom('O', Element.getByAtomicNumber(8), wat)
    h1 = top.addAtom('H1', Element.getByAtomicNumber(1), wat)
    h2 = top.addAtom('H2', Element.getByAtomicNumber(1), wat)
    top.addBond(o, h1)
    top.addBond(o, h2)
    ion = top.addResidue('NA+', chain)
    top.addAtom('NA', Element.getByAtomicNumber(11), ion)

    sub = get_subtopology(top)
    atoms = list(sub.atoms())
    assert len(atoms) == len(mol.atoms)
    # ids preserve the ORIGINAL indices
    assert [int(a.id) for a in atoms] == list(range(len(mol.atoms)))
    assert len(list(sub.bonds())) == len(mol.bonds)


def test_molecule_from_openmm_reconstruction(mol_system):
    from grappa_tpu.wrappers.openmm_wrapper import molecule_from_openmm

    mol, _, system, top = mol_system
    rebuilt = molecule_from_openmm(system, top)

    np.testing.assert_array_equal(rebuilt.atomic_numbers, mol.atomic_numbers)
    np.testing.assert_allclose(rebuilt.partial_charges, mol.partial_charges,
                               atol=1e-6)
    assert ({tuple(sorted(map(int, b))) for b in rebuilt.bonds}
            == {tuple(sorted(map(int, b))) for b in mol.bonds})
    assert improper_sets(rebuilt.impropers) == improper_sets(mol.impropers)


def test_classical_parameters_roundtrip(mol_system):
    from grappa_tpu.wrappers.openmm_wrapper import (
        _classical_parameters_from_openmm)

    mol, params, system, _ = mol_system
    extracted = _classical_parameters_from_openmm(system, mol)

    np.testing.assert_allclose(extracted.bond_k, params.bond_k, rtol=1e-6)
    np.testing.assert_allclose(extracted.bond_eq, params.bond_eq, rtol=1e-6)
    np.testing.assert_allclose(extracted.angle_k, params.angle_k, rtol=1e-6)
    np.testing.assert_allclose(extracted.angle_eq, params.angle_eq, rtol=1e-6)
    # torsions compare as signed k over the common periodicity range
    n = min(extracted.proper_ks.shape[1], params.proper_ks.shape[1])
    np.testing.assert_allclose(
        Parameters.to_signed_k(extracted.proper_ks[:, :n],
                               extracted.proper_phases[:, :n]),
        Parameters.to_signed_k(params.proper_ks[:, :n],
                               params.proper_phases[:, :n]), atol=1e-6)
    n = min(extracted.improper_ks.shape[1], params.improper_ks.shape[1])
    np.testing.assert_allclose(
        Parameters.to_signed_k(extracted.improper_ks[:, :n],
                               extracted.improper_phases[:, :n]),
        Parameters.to_signed_k(params.improper_ks[:, :n],
                               params.improper_phases[:, :n]), atol=1e-6)


def test_fake_context_matches_torch_oracle(mol_system):
    """The double's bonded energies/forces agree with the torch oracle on
    the same parameters — i.e. the fake is a faithful openmm stand-in."""
    from grappa_tpu.data.synthetic import torch_bonded_energy
    from grappa_tpu.wrappers.openmm_wrapper import (
        get_energies, remove_forces_from_system)
    import copy

    mol, params, system, _ = mol_system
    xyz = embed_conformers(mol, n_confs=3, seed=5)
    bonded = remove_forces_from_system(copy.deepcopy(system),
                                       remove=('Nonbonded',))
    energy, gradient = get_energies(bonded, xyz)

    ref_energy, ref_gradient = torch_bonded_energy(mol, params, xyz)
    # openmm torsions carry a +sum|k| offset vs the signed-k convention:
    # compare mean-centered energies, gradients directly
    np.testing.assert_allclose(energy - energy.mean(),
                               ref_energy - ref_energy.mean(),
                               atol=1e-4)
    np.testing.assert_allclose(gradient, ref_gradient, atol=1e-3)


def test_write_to_system_semantics(mol_system):
    import copy
    import openmm
    import openmm.unit as u
    from grappa_tpu.wrappers.openmm_wrapper import (
        get_energies, molecule_from_openmm, remove_forces_from_system,
        write_to_system)
    from grappa_tpu.data.synthetic import torch_bonded_energy

    mol, _, system, top = mol_system
    system = copy.deepcopy(system)
    new_params = random_parameters(mol, seed=99)
    write_to_system(system, new_params)

    # old torsion entries covered by the prediction are zeroed
    old_torsions = [f for f in system.getForces()
                    if isinstance(f, openmm.PeriodicTorsionForce)
                    and f.getName() != 'grappa_torsions']
    assert old_torsions
    for force in old_torsions:
        for i in range(force.getNumTorsions()):
            *_, k = force.getTorsionParameters(i)
            assert k.value_in_unit(u.kilocalorie_per_mole) == 0.0

    # a fresh force named grappa_torsions exists
    names = [f.getName() for f in system.getForces()]
    assert 'grappa_torsions' in names

    # the reparametrized system's bonded energy equals the torch oracle on
    # the NEW parameters (bond/angle overwritten in place, torsions appended)
    xyz = embed_conformers(mol, n_confs=3, seed=6)
    bonded = remove_forces_from_system(copy.deepcopy(system),
                                       remove=('Nonbonded',))
    energy, gradient = get_energies(bonded, xyz)
    ref_energy, ref_gradient = torch_bonded_energy(mol, new_params, xyz)
    np.testing.assert_allclose(energy - energy.mean(),
                               ref_energy - ref_energy.mean(), atol=1e-4)
    np.testing.assert_allclose(gradient, ref_gradient, atol=1e-3)


def test_moldata_from_openmm_system(mol_system):
    import copy
    from grappa_tpu.wrappers.openmm_wrapper import (
        get_energies, moldata_from_openmm_system, remove_forces_from_system)

    mol, params, system, top = mol_system
    xyz = embed_conformers(mol, n_confs=4, seed=8)
    rng = np.random.default_rng(0)
    qm_energy = rng.normal(0, 5, size=4)
    qm_gradient = rng.normal(0, 2, size=xyz.shape)

    md = moldata_from_openmm_system(system, top, xyz, qm_energy, qm_gradient,
                                    mol_id='test-mol', ff_name='fake_ff')

    nb_only = remove_forces_from_system(copy.deepcopy(system),
                                        keep=('Nonbonded', 'CMMotion'))
    nb_energy, nb_gradient = get_energies(nb_only, xyz)

    expect_ref = qm_energy - nb_energy
    expect_ref = expect_ref - expect_ref.mean()
    np.testing.assert_allclose(md.energy_ref, expect_ref, atol=1e-4)
    np.testing.assert_allclose(md.gradient_ref, qm_gradient - nb_gradient,
                               atol=1e-4)
    assert 'fake_ff' in md.ff_energy and 'fake_ff' in md.ff_nonbonded_energy
    np.testing.assert_allclose(md.classical_parameters.bond_k, params.bond_k,
                               rtol=1e-5)
    # round-trips through the dataset npz layout
    d = md.to_dict()
    from grappa_tpu.data.moldata import MolData
    md2 = MolData.from_dict(d)
    np.testing.assert_allclose(md2.energy_ref, md.energy_ref, atol=1e-6)


def test_parametrize_system_end_to_end(mol_system):
    import copy
    import openmm
    from grappa_tpu.models.grappa_model import (
        get_small_model_config, make_model)
    from grappa_tpu.wrappers.openmm_wrapper import OpenmmGrappa
    import jax

    mol, _, system, top = mol_system
    system = copy.deepcopy(system)

    from grappa_tpu.data.graph_batch import MolGraph, collate
    model = make_model(get_small_model_config())
    graph = MolGraph.from_molecule(mol)
    batch = collate([graph], n_confs=1)
    params = model.init(jax.random.key(0), batch)

    ff = OpenmmGrappa(model, params)
    import tempfile
    plot_dir = tempfile.mkdtemp(prefix='grappa_plots_')
    out = ff.parametrize_system(system, top, check_eq_values=False,
                                plot_dir=plot_dir)
    assert out is system
    from pathlib import Path
    for name in ('grappa_parameters.png', 'reference_parameters.png',
                 'parameter_comparison.png'):
        assert (Path(plot_dir) / name).exists(), name
    assert 'grappa_torsions' in [f.getName() for f in system.getForces()]

    # bond entries now carry the model's predictions
    pred = ff.predict(mol, check_eq_values=False)
    bond_force = next(f for f in system.getForces()
                      if isinstance(f, openmm.HarmonicBondForce))
    import openmm.unit as u
    got = {}
    for i in range(bond_force.getNumBonds()):
        a, b, eq, k = bond_force.getBondParameters(i)
        got[tuple(sorted((int(a), int(b))))] = (
            eq.value_in_unit(u.angstrom),
            k.value_in_unit(u.kilocalorie_per_mole / u.angstrom ** 2))
    for j, bond in enumerate(pred.bonds):
        key = tuple(sorted(map(int, bond)))
        np.testing.assert_allclose(got[key][0], pred.bond_eq[j], rtol=1e-5)
        np.testing.assert_allclose(got[key][1], pred.bond_k[j], rtol=1e-5)


def test_openmm_identity_oracle(mol_system):
    """The reference's key correctness oracle (reference: tests/
    openmm_wrapper_identity.py:1-100): an identity 'model' that predicts the
    system's own classical parameters, pushed through the full
    molecule_from_openmm -> predict -> write_to_system chain, must leave the
    system's energies and gradients unchanged (to 1e-3) — validating the
    whole wrapper pipeline with no ML in the loop."""
    import copy
    from grappa_tpu.wrappers.openmm_wrapper import (
        OpenmmGrappa, _classical_parameters_from_openmm, get_energies)

    mol, _, orig_system, top = mol_system
    xyz = embed_conformers(mol, n_confs=3, seed=21)
    ref_energy, ref_gradient = get_energies(orig_system, xyz)

    class IdentityGrappa(OpenmmGrappa):
        def __init__(self):   # no model needed
            self.config = {}

        def predict(self, molecule, check_eq_values=True):
            return _classical_parameters_from_openmm(orig_system, molecule)

    system = copy.deepcopy(orig_system)
    IdentityGrappa().parametrize_system(system, top)

    energy, gradient = get_energies(system, xyz)
    np.testing.assert_allclose(energy, ref_energy, atol=1e-3)
    np.testing.assert_allclose(gradient, ref_gradient, atol=1e-3)


def test_hyp_dop_bond_repair():
    from openmm.app import Element, Topology
    from grappa_tpu.wrappers.hyp_dop import (
        HYP_BONDS, add_nonstandard_residue_bonds)

    top = Topology()
    chain = top.addChain('A')
    # ALA (with bonds) - HYP (no bonds) - ALA (with bonds)
    def add_res(name, atom_names, zs):
        res = top.addResidue(name, chain)
        return {n: top.addAtom(n, Element.getByAtomicNumber(z), res)
                for n, z in zip(atom_names, zs)}

    ala1 = add_res('ALA', ['N', 'CA', 'C', 'O', 'CB'], [7, 6, 6, 8, 6])
    top.addBond(ala1['N'], ala1['CA'])
    top.addBond(ala1['CA'], ala1['C'])
    top.addBond(ala1['C'], ala1['O'])
    top.addBond(ala1['CA'], ala1['CB'])

    hyp_atom_names = sorted({n for b in HYP_BONDS for n in b})
    hyp = add_res('HYP', hyp_atom_names, [6] * len(hyp_atom_names))

    ala2 = add_res('ALA', ['N', 'CA', 'C', 'O', 'CB'], [7, 6, 6, 8, 6])
    top.addBond(ala2['N'], ala2['CA'])

    n_before = len(list(top.bonds()))
    added = add_nonstandard_residue_bonds(top)
    # all template bonds + peptide bond to prev C and next N
    assert added == len(HYP_BONDS) + 2
    assert len(list(top.bonds())) == n_before + added

    bond_keys = {frozenset((a.index, b.index)) for a, b in top.bonds()}
    assert frozenset((ala1['C'].index, hyp['N'].index)) in bond_keys
    assert frozenset((hyp['C'].index, ala2['N'].index)) in bond_keys

    # idempotent: nothing added twice
    assert add_nonstandard_residue_bonds(top) == 0


# ---------------------------------------------------------------------------
# amber99sbildn* (star) force field machinery: HYP/DOP end-to-end
def _pdb_line(serial, name, res, chain, seq, xyz, element):
    pname = f' {name}' if len(name) < 4 else name
    return (f'ATOM  {serial:5d} {pname:<4s} {res:<3s} {chain}{seq:4d}    '
            f'{xyz[0]:8.3f}{xyz[1]:8.3f}{xyz[2]:8.3f}  1.00  0.00'
            f'          {element:>2s}')


def _capped_hyp_pdb():
    """ACE-HYP-NME with the reference residue atom naming."""
    residues = [
        ('ACE', ['HH31', 'CH3', 'HH32', 'HH33', 'C', 'O']),
        ('HYP', ['N', 'CD2', 'HD21', 'HD22', 'CG', 'HG', 'OD1', 'HD1',
                 'CB', 'HB1', 'HB2', 'CA', 'HA', 'C', 'O']),
        ('NME', ['N', 'H', 'CH3', 'HH31', 'HH32', 'HH33']),
    ]
    lines, serial = [], 1
    rng = np.random.default_rng(0)
    for seq, (res, names) in enumerate(residues, start=1):
        for name in names:
            element = name[0]
            xyz = rng.uniform(0, 20, 3)
            lines.append(_pdb_line(serial, name, res, 'A', seq, xyz, element))
            serial += 1
    return '\n'.join(lines) + '\nEND\n'


def test_star_forcefield_hyp_peptide_end_to_end():
    """topology_from_pdb -> get_openmm_forcefield('amber99sbildn*') ->
    createSystem (repairs the unbonded HYP residue) -> parametrize_system.
    Reference: openmm_utils.py:291-340 + amber99sbildn-star_.xml."""
    import jax
    import openmm.unit as u

    from grappa_tpu.data.graph_batch import MolGraph, collate
    from grappa_tpu.models.grappa_model import (get_small_model_config,
                                                make_model)
    from grappa_tpu.wrappers.openmm_wrapper import (OpenmmGrappa,
                                                    molecule_from_openmm)
    from grappa_tpu.wrappers.star_forcefield import (
        HYP_ATOMS, HYP_BOND_IDXS, get_openmm_forcefield, topology_from_pdb)

    top = topology_from_pdb(_capped_hyp_pdb())
    assert top.getNumAtoms() == 27
    # PDBFile leaves HYP unbonded: only ACE(5) + NME(5) internal bonds
    n_bonds_before = sum(1 for _ in top.bonds())
    assert n_bonds_before == 10

    # the plain force field cannot type HYP at all
    with pytest.raises(ValueError, match='HYP'):
        get_openmm_forcefield('amber99sbildn').createSystem(top)

    ff = get_openmm_forcefield('amber99sbildn*')
    system = ff.createSystem(top)
    # repair added the 15 intra-HYP template bonds + 2 peptide links
    n_bonds_after = sum(1 for _ in top.bonds())
    assert n_bonds_after == n_bonds_before + len(HYP_BOND_IDXS) + 2
    assert system.getNumParticles() == 27

    # charges come from the first-party star templates (net-zero residue)
    import openmm
    nb = next(f for f in system.getForces()
              if isinstance(f, openmm.NonbondedForce))
    hyp_atoms = {a.name: a.index for a in list(top.residues())[1].atoms()}
    q_n = nb.getParticleParameters(hyp_atoms['N'])[0]
    assert abs(q_n.value_in_unit(u.elementary_charge) - (-0.25480)) < 1e-6
    total = sum(nb.getParticleParameters(i)[0].value_in_unit(
        u.elementary_charge) for i in hyp_atoms.values())
    assert abs(total) < 1e-6
    assert abs(sum(a[4] for a in HYP_ATOMS)) < 1e-9   # template integrity

    # full grappa parametrization of the repaired system
    mol = molecule_from_openmm(system, top)
    model = make_model(get_small_model_config())
    params = model.init(jax.random.key(0),
                        collate([MolGraph.from_molecule(mol)], n_confs=1))
    out = OpenmmGrappa(model, params).parametrize_system(
        system, top, check_eq_values=False)
    assert out is system
    bond_force = next(f for f in system.getForces()
                      if isinstance(f, openmm.HarmonicBondForce))
    assert bond_force.getNumBonds() == n_bonds_after


def test_dop_template_integrity():
    from grappa_tpu.wrappers.star_forcefield import (DOP_ATOMS, DOP_BOND_IDXS,
                                                     build_star_patch_xml)
    import xml.etree.ElementTree as ET
    assert abs(sum(a[4] for a in DOP_ATOMS)) < 1e-9     # net-zero residue
    # every bond index in range; every atom appears in >= 1 bond
    n = len(DOP_ATOMS)
    touched = {i for b in DOP_BOND_IDXS for i in b}
    assert touched == set(range(n))
    root = ET.fromstring(build_star_patch_xml())        # well-formed XML
    assert {r.get('name') for r in root.findall('./Residues/Residue')} == \
        {'HYP', 'DOP'}
