#!/usr/bin/env bash
# Environment setup (reference setup.sh capability): install the package,
# build the native runtime, run the smoke check. Assumes jax/flax/optax etc.
# are already present (hermetic image); pass --venv to create one first.
set -euo pipefail
cd "$(dirname "$0")"

if [[ "${1:-}" == "--venv" ]]; then
    python -m venv .venv
    # shellcheck disable=SC1091
    source .venv/bin/activate
    echo "created and activated .venv"
fi

echo "== installing nerf-tpu (editable) =="
pip install -e . --no-build-isolation --no-deps -q

echo "== building native runtime =="
if command -v g++ >/dev/null && make -C nerf_tpu/runtime -s; then
    echo "native runtime built"
else
    echo "native toolchain unavailable; pure-Python fallbacks will be used"
fi

echo "== smoke check =="
nerf-tpu smoke

echo "setup complete"
