"""grappa-1.1 production training (reference: experiments/train-grappa-1.1/
train.py — full arg surface incl. bondbreak radicals, shrink_train,
n_periodicity, torsion-cutoff toggle, pretrain init)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from production_driver import run_production

if __name__ == '__main__':
    run_production(Path(__file__).parent, 'grappa-1.1')
