#!/usr/bin/env bash
# Build script (equivalent of the reference's dual 16/32-bit build.sh).
#
# The reference compiles two CUDA binaries (spotfinder / spotfinder32);
# here pixel depth is a runtime dtype and both console scripts
# (`spotfinder`, `spotfinder32`) come from one package, so "build" means:
# compile the native decode/CC library, install the package, and smoke the
# entry points.
set -euo pipefail
cd "$(dirname "$0")"

echo "== native library (csrc/ffs_native.cpp) =="
python - <<'PY'
from ffs_tpu.utils.native import lib
l = lib()
print("native library:", "OK" if l is not None else "UNAVAILABLE (NumPy fallbacks active)")
PY

echo "== package install =="
pip install -e . -q --no-deps --no-build-isolation

echo "== entry points =="
spotfinder --version
python -m ffs_tpu.pipeline.indexer --help >/dev/null
python -m ffs_tpu.pipeline.integrator --help >/dev/null
python -m ffs_tpu.pipeline.predictor --help >/dev/null
echo "build OK"
