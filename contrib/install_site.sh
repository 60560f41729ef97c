#!/usr/bin/env bash
# Site install helper — the TPU-service analogue of the reference's
# contrib/install_dls_sw.sh (which mamba-creates an env under
# /dls_sw/apps/fast-feedback-service, pip-installs the source and runs the
# CMake/ninja CUDA build).  Here there is no CUDA toolchain and no separate
# CMake tree: the only native artifact (csrc/ffs_native.cpp) is compiled
# on demand by ffs_tpu.utils.native, so "install" is: create/refresh a
# venv at $FFS_PREFIX, install the package, warm the native library and
# smoke the console entry points.
#
# Usage: FFS_PREFIX=/path/to/apps/ffs-tpu contrib/install_site.sh
# Idempotent; reruns reuse the venv.  A change to this script (tracked by
# a checksum, like the reference's refresh.sha) resets the env.
set -euo pipefail

DIR="${FFS_PREFIX:-/opt/ffs-tpu}"
SRC="$(cd "$(dirname "$0")/.." && pwd)"

mkdir -p "$DIR"
# Reference parity: full reset when the install script itself changed.
if ! sha256sum -c "$DIR/refresh.sha" >/dev/null 2>&1; then
    echo "Install script changed or fresh install; resetting env"
    rm -rf "$DIR/ENV"
    sha256sum "$SRC/contrib/install_site.sh" > "$DIR/refresh.sha"
fi

if [[ ! -d "$DIR/ENV" ]]; then
    python3 -m venv --system-site-packages "$DIR/ENV"
    # jax / the TPU plugin / setuptools come from the invoking
    # interpreter's environment (zero-egress sites cannot resolve them).
    # --system-site-packages only exposes the BASE python's site dir; if
    # python3 is itself a venv (common on TPU images), link its site
    # directory in explicitly via a .pth file.
    HOST_SITE=$(python3 -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
    # (2>/dev/null: before the .pth exists, a host sitecustomize that
    # imports third-party modules warns harmlessly in the bare env)
    ENV_SITE=$("$DIR/ENV/bin/python" -c "import sysconfig; print(sysconfig.get_paths()['purelib'])" 2>/dev/null)
    if [[ "$HOST_SITE" != "$ENV_SITE" ]]; then
        echo "$HOST_SITE" > "$ENV_SITE/_ffs_host_site.pth"
    fi
fi
# --no-build-isolation: zero-egress — setuptools must come from the env.
"$DIR/ENV/bin/pip" install -e "$SRC" -q --no-deps --no-build-isolation

# Warm the on-demand native build and smoke the entry points (build.sh).
"$DIR/ENV/bin/python" - <<'PY'
from ffs_tpu.utils.native import lib
print("native library:", "OK" if lib() is not None else "UNAVAILABLE (NumPy fallbacks active)")
PY
"$DIR/ENV/bin/spotfinder" --version
"$DIR/ENV/bin/python" -m ffs_tpu.pipeline.indexer --help >/dev/null
"$DIR/ENV/bin/python" -m ffs_tpu.pipeline.integrator --help >/dev/null
echo "site install OK: $DIR/ENV"
