"""grappa-1.0 production training (reference: experiments/train-grappa-1.0/
train.py:1-44 — the -tb/-vb/-p arg surface, espaloma splitpath)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from production_driver import run_production

if __name__ == '__main__':
    run_production(Path(__file__).parent, 'grappa-1.0', v1_0=True)
