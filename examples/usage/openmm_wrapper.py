"""Parametrizing an OpenMM system (reference: examples/usage/
openmm_wrapper.py). Requires openmm and a model (tag or file).

Workflow: build your solvated system with a classical force field as usual;
grappa then overwrites the BONDED parameters of the non-water/non-ion part
(bonds, angles, torsions) and leaves nonbonded parameters (charges, LJ,
solvent) untouched.
"""
from openmm import unit
from openmm.app import ForceField, Modeller, PDBFile

from grappa_tpu.wrappers.openmm_wrapper import OpenmmGrappa

pdb = PDBFile('protein.pdb')
classical_ff = ForceField('amber99sbildn.xml', 'tip3p.xml')

modeller = Modeller(pdb.topology, pdb.positions)
modeller.deleteWater()
modeller.addHydrogens(classical_ff)
modeller.addSolvent(classical_ff, model='tip3p',
                    padding=1.0 * unit.nanometers)
topology = modeller.getTopology()
system = classical_ff.createSystem(topology)

# charge_model tells grappa how the charges were derived ('amber99' for
# classical protein FFs, 'am1BCC' for small-molecule charges)
ff = OpenmmGrappa.from_tag('grappa-1.2')
system = ff.parametrize_system(system, topology, charge_model='amber99',
                               plot_dir='.')   # writes parameter plots

# `system` is a normal openmm System: simulate, minimize, export as usual.
# For HYP/DOP-containing PDBs, repair the topology first:
#   from grappa_tpu.wrappers.hyp_dop import add_nonstandard_residue_bonds
#   add_nonstandard_residue_bonds(topology)
