#!/usr/bin/env bash
# Reparametrizing a GROMACS topology (reference: examples/usage/
# gromacs_wrapper.sh). The .top parser/writer is self-contained — no
# kimmdy/gromacs python tooling needed.

# full reparametrization of the bonded terms (solvent/ions untouched):
python -m grappa_tpu.cli gmx -f topol.top -o topol_grappa.top -t grappa-1.2

# partial reparametrization around given atom numbers (the radical
# workflow: only tuples within the model's field of view change):
python -m grappa_tpu.cli gmx -f topol.top -o topol_partial.top \
    -t grappa-1.2 --focus 1 2 3

# with a parameter violin plot of what was written:
python -m grappa_tpu.cli gmx -f topol.top -o topol_grappa.top \
    -t grappa-1.2 -p parameters.png

# then run GROMACS as usual: gmx grompp -f minim.mdp -c conf.gro \
#     -p topol_grappa.top -o em.tpr && gmx mdrun -deffnm em
