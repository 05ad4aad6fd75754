#!/bin/bash
# Session-start recovery after a host filesystem reset (see CLAUDE.md).
#
# The reset restores a fresh git checkout: everything untracked is lost —
# the site-packages .pth import hook, ~/.cache (XLA compile cache, dataset
# zoo), gitignored bench batch caches, native .so, run dirs. This script
# restores the pieces a round needs, idempotently and CPU-only (it never
# touches the TPU chip, so it is safe to run while another process holds it).
#
# Usage:  bash scripts/bootstrap.sh [--warm-bench]
#   --warm-bench  also rebuild the bench.py batch caches (CPU-bound,
#                 a few minutes; do this early so the driver's round-end
#                 bench.py hits warm caches instead of rebuilding).
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)

# 1. import hook: make grappa_tpu importable from any cwd
SITE=$(python -c "import site; print(site.getsitepackages()[0])")
echo "$REPO" > "$SITE/grappa_tpu.pth"
echo "bootstrap: wrote $SITE/grappa_tpu.pth"

# 2. native featurization library (auto-builds on first import; force now)
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<'EOF'
from grappa_tpu import native
print(f"bootstrap: native featurization available={native.available()}")
EOF

# 3. bench batch caches (optional; skipped when already present)
if [ "$1" = "--warm-bench" ]; then
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<'EOF'
import bench
bench.build_batch()
bench.build_big_batch()
bench.build_protein_batch()
print("bootstrap: bench batch caches warm")
EOF
fi
echo "bootstrap: done"
