#!/bin/bash
# One-time environment setup — the tpu-native counterpart of the reference's
# bashes/misc/install.bash (which nvcc-compiles the CUDA sepconv kernel and
# installs its torch FFI extension).  Here the sepconv kernel is a Pallas/XLA
# program that JAX compiles on demand, so "install" means:
#   1. pre-build the native C++ clip loader (native/vfidata.cpp -> .so);
#   2. sanity-check the Python/JAX environment;
#   3. (optional, WARM_CACHE=1) warm the persistent XLA compile cache with the
#      flagship bi-TAI forward so the first real run skips the cold compile.
#
# Usage: bash scripts/misc/install.sh            # build + verify
#        WARM_CACHE=1 bash scripts/misc/install.sh
set -e
cd "$(dirname "$0")/../.."

echo "== python deps =="
python - <<'EOF'
import importlib
for mod in ("jax", "flax", "optax", "orbax.checkpoint", "numpy", "PIL"):
    importlib.import_module(mod)
    print(f"  {mod}: ok")
import jax
print(f"  jax {jax.__version__}")
EOF

echo "== native clip loader =="
python - <<'EOF'
from vfi_tpu.data import native_loader
if native_loader.available():
    print("  native/libvfidata.so: built and loadable")
else:
    print("  native loader unavailable (g++/libpng/libjpeg missing?) —")
    print("  the pure-Python loader in vfi_tpu/data/datasets.py is the fallback")
EOF

if [ "${WARM_CACHE:-0}" = "1" ]; then
  echo "== warming XLA compile cache (flagship bi-TAI forward; minutes cold) =="
  python - <<'EOF'
from vfi_tpu.utils.jax_setup import setup_jax
setup_jax()  # enables the persistent compile cache
import numpy as np
from __graft_entry__ import entry
fn, args = entry()
import jax
np.asarray(jax.jit(fn)(*args))
print("  compile cache warmed")
EOF
fi

echo "install.sh: done"
