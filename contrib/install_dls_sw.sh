#!/bin/bash
# Beamline installation helper for ffs-tpu.
#
# TPU-native equivalent of the reference install helper
# (reference: contrib/install_dls_sw.sh:1-49): an idempotent bootstrap
# that installs the service into a shared prefix, detects when this
# script itself has changed (hash sentinel) and resets the environment,
# then builds the native library and smoke-checks the entry points.
#
# Differences from the reference, by design:
#   * no conda/mamba or CUDA module loads — the TPU runtime (jax +
#     libtpu) is provided by the host image; we create a plain venv
#     with --system-site-packages so the baked-in jax stack is reused.
#   * pip runs with --no-build-isolation: beamline installs are
#     zero-egress, so build backends must come from the host image.
#   * the CMake step is replaced by build.sh, which compiles
#     csrc/ffs_native.cpp (decompression, CBF byte-offset, host CC)
#     and verifies the console scripts import.
DIR=${FFS_TPU_PREFIX:-/dls_sw/apps/ffs-tpu}
SOURCE=${FFS_TPU_SOURCE:-$DIR/source}

# Handle cases where we've updated this script and want to refresh fully
if ! sha256sum -c "$DIR/refresh.sha" >/dev/null 2>&1; then
    echo "Install script has changed or fresh install; resetting"
    (
        set -x
        rm -rf "$DIR/ENV" "$DIR/build"
        mkdir -p "$DIR"
        sha256sum "$SOURCE/contrib/install_dls_sw.sh" > "$DIR/refresh.sha"
    )
fi

if [[ ! -d "$DIR/ENV" ]]; then
    (
        set -x
        python3 -m venv --system-site-packages "$DIR/ENV"
    )
fi

set -euo pipefail
set -x

"$DIR/ENV/bin/pip" install --no-build-isolation -e "$SOURCE"

# Native library (decompression / CBF / host connected-components) and
# entry-point smoke test.  build.sh caches by source hash, so re-runs
# are cheap.
mkdir -p "$DIR/build"
FFS_NATIVE_BUILD_DIR="$DIR/build" PATH="$DIR/ENV/bin:$PATH" \
    bash "$SOURCE/build.sh"

# Persistent XLA compilation cache shared by all beamline processes:
# first compile of the big chained programs is minutes-slow, every
# later service start is instant.
mkdir -p "$DIR/xla-cache"
cat > "$DIR/ENV/etc_ffs_tpu.env" <<EOF
export JAX_COMPILATION_CACHE_DIR=$DIR/xla-cache
EOF
