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

# NOTE: the committed benchmarks/.batch_cache pickles are keyed by
# bench.py's _CACHE_VERSION — bumping it orphans the tracked files, so a
# bump must regenerate and re-commit them (bash scripts/bootstrap.sh
# --warm-bench && git add benchmarks/.batch_cache).

# 1. import hook: make grappa_tpu importable from any cwd.
# Pin the venv interpreter: `python` from PATH could be a different
# interpreter whose site-packages the venv never reads.
PY=/opt/venv/bin/python
[ -x "$PY" ] || PY=python
SITE=$($PY -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
echo "$REPO" > "$SITE/grappa_tpu.pth"
echo "bootstrap: wrote $SITE/grappa_tpu.pth"

# 2. native featurization library (auto-builds on first import; force now)
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu $PY - <<'EOF'
from grappa_tpu import native
print(f"bootstrap: native featurization available={native.available()}")
EOF

# 3. bench batch caches (optional; skipped when already present)
if [ "$1" = "--warm-bench" ]; then
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu $PY - <<'EOF'
import bench
bench.build_batch()
bench.build_big_batch()
bench.build_protein_batch()
print("bootstrap: bench batch caches warm")
EOF
fi
echo "bootstrap: done"
