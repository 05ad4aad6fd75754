"""GROMACS integration tests: topology round-trip, unit conversion,
parametrization end-to-end, partial (focus) reparametrization."""
import numpy as np
import pytest

import jax

from grappa_tpu.data import MolGraph, collate
from grappa_tpu.data.parameters import Parameters
from grappa_tpu.data.synthetic import make_moldata
from grappa_tpu.models.grappa_model import get_small_model_config, make_model
from grappa_tpu.wrappers.gromacs_topology import GromacsTopology
from grappa_tpu.wrappers.gromacs_wrapper import (
    GromacsGrappa, element_from_mass, fov_neighborhood,
    gromacs_parameter_rows, molecule_from_moleculetype)

TOP_TEXT = """\
; test topology
#include "amber99.ff/forcefield.itp"

[ moleculetype ]
; name  nrexcl
BUT   3

[ atoms ]
;  nr  type  resnr residue atom cgnr charge  mass
    1  CT    1     BUT     C1   1   -0.18   12.011
    2  CT    1     BUT     C2   2   -0.12   12.011
    3  CT    1     BUT     C3   3   -0.12   12.011
    4  CT    1     BUT     C4   4   -0.18   12.011
    5  HC    1     BUT     H1   5    0.06    1.008
    6  HC    1     BUT     H2   6    0.06    1.008
    7  HC    1     BUT     H3   7    0.06    1.008
    8  HC    1     BUT     H4   8    0.06    1.008
    9  HC    1     BUT     H5   9    0.06    1.008
   10  HC    1     BUT     H6  10    0.06    1.008
   11  HC    1     BUT     H7  11    0.06    1.008
   12  HC    1     BUT     H8  12    0.06    1.008
   13  HC    1     BUT     H9  13    0.06    1.008
   14  HC    1     BUT    H10  14    0.06    1.008

[ bonds ]
    1    2  1  0.1529  224262.4
    2    3  1  0.1529  224262.4
    3    4  1  0.1529  224262.4
    1    5  1  0.1090  284512.0
    1    6  1  0.1090  284512.0
    1    7  1  0.1090  284512.0
    2    8  1  0.1090  284512.0
    2    9  1  0.1090  284512.0
    3   10  1  0.1090  284512.0
    3   11  1  0.1090  284512.0
    4   12  1  0.1090  284512.0
    4   13  1  0.1090  284512.0
    4   14  1  0.1090  284512.0

[ pairs ]
    1    4  1

[ angles ]
    1    2    3  1  111.5  400.0
    2    3    4  1  111.5  400.0

[ dihedrals ]
    1    2    3    4  9  0.0  0.6508  1
    1    2    3    4  9  0.0  0.1255  2

[ moleculetype ]
SOL  2

[ atoms ]
    1  OW  1  SOL  OW  1  -0.834  15.999
    2  HW  1  SOL  HW1 1   0.417   1.008
    3  HW  1  SOL  HW2 1   0.417   1.008

[ settles ]
1  1  0.09572  0.15139

[ system ]
butane in water

[ molecules ]
BUT   1
SOL   10
"""


@pytest.fixture(scope='module')
def gmx_model(tmp_path_factory):
    md = make_moldata(seed=0, n_confs=2)
    batch = collate([MolGraph.from_moldata(md)])
    cfg = get_small_model_config()
    model = make_model(cfg)
    params = model.init(jax.random.key(0), batch)
    return GromacsGrappa(model, params, {'model_config': cfg})


def test_topology_roundtrip():
    top = GromacsTopology.parse(TOP_TEXT)
    assert top.write().strip() == TOP_TEXT.strip()
    mols = top.molecule_types()
    assert [m.name for m in mols] == ['BUT', 'SOL']
    but = mols[0]
    assert len(but.atom_rows()) == 14
    assert len(but.bonds()) == 13
    assert but.proper_tuples() == [(1, 2, 3, 4), (1, 2, 3, 4)]


def test_element_from_mass():
    assert element_from_mass(12.011) == 6
    assert element_from_mass(1.008) == 1
    assert element_from_mass(15.999) == 8
    with pytest.raises(ValueError):
        element_from_mass(3.024)  # HMR-style hydrogen


def test_molecule_from_moleculetype():
    top = GromacsTopology.parse(TOP_TEXT)
    mol = molecule_from_moleculetype(top.molecule_types()[0])
    assert len(mol.atoms) == 14
    assert list(mol.atoms[:4]) == [1, 2, 3, 4]  # GROMACS 1-based nrs as ids
    assert mol.atomic_numbers[0] == 6 and mol.atomic_numbers[5] == 1
    assert len(mol.bonds) == 13
    assert mol.partial_charges[0] == pytest.approx(-0.18)


def test_unit_conversion_rows():
    # hand-made parameters in grappa units (kcal/mol, Angstrom, rad)
    params = Parameters(
        atoms=np.array([1, 2, 3, 4]),
        bonds=np.array([[1, 2]]), bond_k=np.array([700.0]),
        bond_eq=np.array([1.5]),
        angles=np.array([[1, 2, 3]]), angle_k=np.array([100.0]),
        angle_eq=np.array([np.pi / 2]),
        propers=np.array([[1, 2, 3, 4]]),
        proper_ks=np.array([[2.0, 0.0]]),
        proper_phases=np.array([[np.pi, 0.0]]),
        impropers=np.array([[1, 3, 2, 4]]),
        improper_ks=np.array([[1.0]]), improper_phases=np.array([[0.0]]))
    rows = gromacs_parameter_rows(params)
    b = rows['bonds'][0].split()
    assert float(b[3]) == pytest.approx(0.15)          # A -> nm
    assert float(b[4]) == pytest.approx(700 * 418.4)   # kcal/A^2 -> kJ/nm^2
    a = rows['angles'][0].split()
    assert float(a[4]) == pytest.approx(90.0)          # rad -> deg
    assert float(a[5]) == pytest.approx(418.4)         # kcal -> kJ
    d = rows['propers'][0].split()
    assert d[4] == '9' and float(d[5]) == pytest.approx(180.0)
    assert float(d[6]) == pytest.approx(2 * 4.184)
    assert d[7] == '1'
    i = rows['impropers'][0].split()
    assert i[4] == '4'


def test_parametrize_end_to_end(gmx_model, tmp_path):
    top_path = tmp_path / 'but.top'
    top_path.write_text(TOP_TEXT)
    out_path = tmp_path / 'out.top'
    gmx_model.parametrize(top_path, out_path, check_eq_values=False)

    out = GromacsTopology.parse(out_path)
    mols = out.molecule_types()
    but = mols[0]
    bonds = but.section('bonds').data_rows()
    assert len(bonds) == 13
    for row in bonds:
        assert row[2] == '1'
        assert 0.05 < float(row[3]) < 0.3          # plausible nm bond length
        assert float(row[4]) > 0                   # positive kJ/nm^2
    angles = but.section('angles').data_rows()
    assert len(angles) == 24                       # all angles, not just 2
    propers = [r for _, r in but.dihedral_rows() if r[4] == '9']
    assert len(propers) == 27 * 6                  # 27 propers x 6 periodicities
    # SOL untouched
    sol = mols[1]
    assert sol.section('settles') is not None
    assert sol.section('bonds') is None
    # file still parses and preserves preamble
    assert '#include "amber99.ff/forcefield.itp"' in out_path.read_text()


def test_fov_neighborhood():
    bonds = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    assert fov_neighborhood(bonds, {1}, 0) == {1}
    assert fov_neighborhood(bonds, {1}, 2) == {1, 2, 3}
    assert fov_neighborhood(bonds, {3}, 1) == {2, 3, 4}
    assert fov_neighborhood(bonds, {1}, 99) == {1, 2, 3, 4, 5, 6}


def test_partial_reparametrization(gmx_model, tmp_path):
    top_path = tmp_path / 'but.top'
    top_path.write_text(TOP_TEXT)
    out_path = tmp_path / 'partial.top'
    gmx_model.parametrize(top_path, out_path, focus_nrs={1},
                          check_eq_values=False)
    out = GromacsTopology.parse(out_path)
    but = out.molecule_types()[0]
    bonds = but.section('bonds').data_rows()
    assert len(bonds) == 13  # same bond set
    # field_of_view = 2 att layers + 3 = 5 hops from atom 1 covers all heavy
    # atoms here, so in this small molecule all bonds get replaced; check
    # replacement happened (original kb 224262.4 gone from C-C rows)
    originals = [r for r in bonds if r[4] == '224262.4']
    assert len(originals) == 0


def test_written_parameters_roundtrip(gmx_model, tmp_path):
    """Identity oracle: the parameters written into the .top file, parsed
    back and converted to grappa units, must equal the model's predictions
    (the TPU analog of the reference's openmm identity test)."""
    import numpy as np
    from grappa_tpu.wrappers.gromacs_wrapper import (
        ANGLE_EQ_FACTOR, ANGLE_K_FACTOR, BOND_EQ_FACTOR, BOND_K_FACTOR,
        TORSION_K_FACTOR, molecule_from_moleculetype)

    top_path = tmp_path / 'but.top'
    top_path.write_text(TOP_TEXT)
    out_path = tmp_path / 'rt.top'
    gmx_model.parametrize(top_path, out_path, check_eq_values=False)

    # independent prediction for the same molecule
    top = GromacsTopology.parse(top_path)
    mol = molecule_from_moleculetype(top.molecule_types()[0])
    predicted = gmx_model.predict(mol, check_eq_values=False)

    out = GromacsTopology.parse(out_path)
    but = out.molecule_types()[0]

    bond_rows = {tuple(sorted((int(r[0]), int(r[1])))): r
                 for r in but.section('bonds').data_rows()}
    for i, (a, b) in enumerate(predicted.bonds):
        row = bond_rows[tuple(sorted((int(a), int(b))))]
        np.testing.assert_allclose(float(row[3]),
                                   predicted.bond_eq[i] * BOND_EQ_FACTOR,
                                   rtol=1e-4)
        np.testing.assert_allclose(float(row[4]),
                                   predicted.bond_k[i] * BOND_K_FACTOR,
                                   rtol=1e-4)

    # propers: k values per periodicity round-trip (signed k -> phase/k)
    proper_rows = {}
    for _, r in but.dihedral_rows():
        if r[4] == '9':
            proper_rows.setdefault(tuple(int(x) for x in r[:4]), {})[
                int(r[7])] = (float(r[5]), float(r[6]))
    for i, tup in enumerate(predicted.propers):
        key = tuple(int(x) for x in tup)
        rows = proper_rows.get(key) or proper_rows.get(key[::-1])
        assert rows is not None, key
        for n in range(1, predicted.proper_ks.shape[1] + 1):
            phase_deg, k_kj = rows[n]
            np.testing.assert_allclose(
                k_kj, predicted.proper_ks[i, n - 1] * TORSION_K_FACTOR,
                rtol=1e-3, atol=1e-5)
            expected_phase = predicted.proper_phases[i, n - 1] * 180 / np.pi
            np.testing.assert_allclose(phase_deg, expected_phase, atol=1e-2)


def test_include_resolution(gmx_model, tmp_path):
    """#include'd molecule .itp files are inlined and parametrized; absent
    force-field includes stay verbatim."""
    (tmp_path / 'mol.itp').write_text(
        "[ moleculetype ]\nETH 3\n[ atoms ]\n"
        " 1 CT 1 ETH C1 1 -0.1 12.011\n 2 CT 1 ETH C2 2 -0.1 12.011\n"
        " 3 HC 1 ETH H1 3 0.05 1.008\n 4 HC 1 ETH H2 4 0.05 1.008\n"
        "[ bonds ]\n 1 2 1 0.15 2000\n 1 3 1 0.11 2000\n 2 4 1 0.11 2000\n")
    top_text = ('#include "amber99.ff/forcefield.itp"\n'
                '#include "mol.itp"\n\n[ system ]\ne\n[ molecules ]\nETH 1\n')
    (tmp_path / 'sys.top').write_text(top_text)

    top = GromacsTopology.parse(tmp_path / 'sys.top', resolve_includes=True)
    mols = top.molecule_types()
    assert [m.name for m in mols] == ['ETH']
    assert '#include "amber99.ff/forcefield.itp"' in top.write()
    # and the wrapper can parametrize the inlined molecule
    out = tmp_path / 'sys_out.top'
    import grappa_tpu.wrappers.gromacs_topology as gt
    parsed = gmx_model.parametrize.__self__ if False else None
    top2 = GromacsTopology.parse(tmp_path / 'sys.top', resolve_includes=True)
    gmx_model._parametrize_moleculetype(top2, top2.molecule_types()[0],
                                        charge_model='amber99',
                                        focus_nrs=None, check_eq_values=False)
    rows = top2.molecule_types()[0].section('bonds').data_rows()
    assert len(rows) == 3 and all(r[2] == '1' for r in rows)


def test_cli_focus_flag(gmx_model, tmp_path):
    """`grappa_gmx --focus`: file-based partial reparametrization through
    the CLI (the kimmdy radical workflow without kimmdy)."""
    from grappa_tpu.cli import main
    from grappa_tpu.train.export import build_model_dict, save_model_dict

    model_path = tmp_path / 'model.npz'
    save_model_dict(build_model_dict(gmx_model.params, gmx_model.config,
                                     model=gmx_model.model), model_path)
    top_path = tmp_path / 'but.top'
    top_path.write_text(TOP_TEXT)
    out_path = tmp_path / 'cli_partial.top'

    plot_path = tmp_path / 'partial_params.png'
    rc = main(['gmx', '-f', str(top_path), '-o', str(out_path),
               '-t', str(model_path), '--focus', '1', '-p', str(plot_path)])
    assert rc == 0
    out = GromacsTopology.parse(out_path)
    bonds = out.molecule_types()[0].section('bonds').data_rows()
    assert len(bonds) == 13
    assert not any(r[4] == '224262.4' for r in bonds)   # rewritten
    assert plot_path.exists()   # plot restricted to the written region


def test_filter_parameters():
    from grappa_tpu.wrappers.gromacs_wrapper import filter_parameters
    from grappa_tpu.data.synthetic import random_molecule, random_parameters
    mol = random_molecule(seed=5, n_atoms=12)
    params = random_parameters(mol, seed=1)
    keep = set(range(6))
    sub = filter_parameters(params, keep)
    assert all(all(int(x) in keep for x in b) for b in sub.bonds)
    assert len(sub.bonds) < len(params.bonds)
    # values follow their tuples
    idx = {tuple(map(int, b)): i for i, b in enumerate(params.bonds)}
    for j, b in enumerate(sub.bonds):
        np.testing.assert_allclose(sub.bond_k[j],
                                   params.bond_k[idx[tuple(map(int, b))]])


MESSY_TOP = """
; a comment line
#define FLEXIBLE   ; trailing comment
[ defaults ]
 1  2  yes  0.5 0.8333

[moleculetype]   ; no spaces inside the brackets
 MOL   3

[ atoms ]
; nr type resnr residue atom cgnr charge mass
  1  CT  1  MOL  C1  1  -0.1  12.011
  2  HC  1  MOL  H1  1   0.05  1.008
  3  HC  1  MOL  H2  1   0.05  1.008

[ bonds ]
  1 2 1
\t1 3 1  ; tab-indented + trailing comment

[ system ]
messy test
[ molecules ]
MOL 1
"""


def test_parser_tolerates_messy_topologies():
    """Real-world .top quirks: comments, #define, bracket spacing variants,
    tabs, trailing comments, blank lines — parse, round-trip, and survive a
    reparse of our own output."""
    top = GromacsTopology.parse(MESSY_TOP)
    mol = top.molecule_types()[0]
    assert mol.name == 'MOL'
    assert len(mol.atom_rows()) == 3
    assert [r[:2] for r in mol.section('bonds').data_rows()] == [
        ['1', '2'], ['1', '3']]
    again = GromacsTopology.parse(top.write())
    assert [m.name for m in again.molecule_types()] == ['MOL']
    assert len(again.molecule_types()[0].atom_rows()) == 3


ATOMTYPES_TOP = """\
[ atomtypes ]
; name  at.num  mass     charge  ptype  sigma    epsilon
  CX    6       12.0110  0.000   A      0.33997  0.45773
  HX    1        1.0080  0.000   A      0.26495  0.06569

[ moleculetype ]
NOMASS 3

[ atoms ]
; nr type resnr residue atom cgnr charge     (no mass column)
  1  CX   1     MOL     C1   1   -0.18
  2  HX   1     MOL     H1   2    0.06
  3  HX   1     MOL     H2   3    0.06
  4  HX   1     MOL     H3   4    0.06

[ bonds ]
  1 2 1
  1 3 1
  1 4 1

[ system ]
x
[ molecules ]
NOMASS 1
"""


def test_atomtype_info_resolves_massless_atoms():
    """Atoms whose [atoms] rows omit the mass column must resolve their
    element through [atomtypes] (at.num or mass) — and ERROR without it,
    never silently default to hydrogen."""
    top = GromacsTopology.parse(ATOMTYPES_TOP)
    info = top.atomtype_info()
    assert info['CX'] == (6, pytest.approx(12.011))
    assert info['HX'] == (1, pytest.approx(1.008))

    mt = top.molecule_types()[0]
    mol = molecule_from_moleculetype(mt, type_info=info)
    assert list(mol.atomic_numbers) == [6, 1, 1, 1]

    with pytest.raises(ValueError, match='no mass'):
        molecule_from_moleculetype(mt)


MIXED_DIHEDRALS_TOP = """\
[ moleculetype ]
CHAIN 3

[ atoms ]
;  nr type resnr residue atom cgnr charge mass
""" + '\n'.join(
    f"  {i}  CT  1  CHN  C{i}  {i}  0.0  12.011" for i in range(1, 31)
) + """

[ bonds ]
""" + '\n'.join(f"  {i} {i+1} 1  0.15 250000.0" for i in range(1, 30)) + """

[ angles ]
""" + '\n'.join(f"  {i} {i+1} {i+2} 1  111.0 400.0"
                 for i in range(1, 29)) + """

[ dihedrals ]
  1 2 3 4     9  0.0 0.65 1
  2 3 4 5     4  180.0 4.6 2
  14 15 16 17 9  0.0 0.65 1
  14 15 16 17 3  9.2 -9.2 0.0 0.0 0.0 0.0
  26 27 28 29 4  180.0 4.6 2

[ system ]
chain
[ molecules ]
CHAIN 1
"""


def test_focus_preserves_foreign_functs_and_outside_rows(gmx_model,
                                                         tmp_path):
    """Partial reparametrization must only remove rows it rewrites: a
    funct-3 (RB) torsion and funct-4/9 rows OUTSIDE the focus region
    survive, even in a mixed [dihedrals] section."""
    top_path = tmp_path / 'chain.top'
    top_path.write_text(MIXED_DIHEDRALS_TOP)
    out_path = tmp_path / 'chain_out.top'
    gmx_model.parametrize(top_path, out_path, focus_nrs={1},
                          check_eq_values=False)
    out = GromacsTopology.parse(out_path)
    rows = [r for _, r in out.molecule_types()[0].dihedral_rows()]
    # the RB torsion (funct 3, atoms 14-17, far outside the focus) survives
    assert any(r[4] == '3' for r in rows), rows
    # the far funct-9 proper and funct-4 improper survive with their
    # original parameters
    assert any(r[:5] == ['14', '15', '16', '17', '9'] and r[6] == '0.65'
               for r in rows)
    assert any(r[:5] == ['26', '27', '28', '29', '4'] for r in rows)
    # bonds outside the focus keep the original force constant
    bonds = out.molecule_types()[0].section('bonds').data_rows()
    assert any(r[4] == '250000.0' for r in bonds)
    # and bonds at the focus were rewritten
    assert any(r[:2] == ['1', '2'] and r[4] != '250000.0' for r in bonds)


def test_disconnected_focus_components(gmx_model, tmp_path):
    """Two focus atoms at opposite chain ends (the kimmdy homolysis case)
    produce a DISCONNECTED field-of-view subgraph; parametrization must
    predict per connected component instead of aborting."""
    top_path = tmp_path / 'chain2.top'
    top_path.write_text(MIXED_DIHEDRALS_TOP)
    out_path = tmp_path / 'chain2_out.top'
    gmx_model.parametrize(top_path, out_path, focus_nrs={1, 30},
                          check_eq_values=False)
    out = GromacsTopology.parse(out_path)
    bonds = out.molecule_types()[0].section('bonds').data_rows()
    # both ends rewritten, middle untouched
    assert any(r[:2] == ['1', '2'] and r[4] != '250000.0' for r in bonds)
    assert any(r[:2] == ['29', '30'] and r[4] != '250000.0' for r in bonds)
    assert any(r[:2] == ['15', '16'] and r[4] == '250000.0' for r in bonds)
    # the wrapper recorded one prediction per component
    assert len(gmx_model.last_predictions['CHAIN']) == 2


def test_atomtype_info_six_column_layout():
    """[atomtypes] without the optional at.num column (6 fields): mass is
    still found two fields before the particle-type letter."""
    top = GromacsTopology.parse("""\
[ atomtypes ]
; name  mass     charge  ptype  sigma    epsilon
  OW    15.9994  0.000   A      0.31507  0.63639
""")
    info = top.atomtype_info()
    assert info['OW'] == (None, pytest.approx(15.9994))
