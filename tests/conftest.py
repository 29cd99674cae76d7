"""Test configuration: force the CPU backend with 8 virtual devices.

Golden-parity tests want IEEE f32 (bit-stable vs the reference's CPU math),
and sharding tests want a multi-device mesh without TPU hardware.  Both are
served by XLA's host platform with a forced device count.
"""

import os
import sys
import pathlib

# Tests run on the CPU backend by default even when the session environment
# points JAX at a TPU (JAX_PLATFORMS=axon): golden parity needs IEEE f32,
# and tiny 64x64 kernels would eat TPU compile time for nothing.  The
# environment's platform wrapper force-appends its own platform, so the env
# var alone is not enough — override the config before any backend
# initializes.
#
# PAINTFE_TEST_BACKEND=tpu opts into running the suite on the real chip
# (exact_div's Newton-refined divide makes most goldens bit-exact there;
# set GOLDEN_TOLERANCE=1 for the residual forced-FMA ulps, and expect long
# compile times).
_backend = os.environ.get("PAINTFE_TEST_BACKEND", "cpu")
if _backend == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags0 = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags0:
    # SSE4_2: XLA:CPU's LLVM backend contracts mul+add into FMA on AVX2+,
    # which breaks bit-exact parity with the reference's strict f32 (off-by-
    # one u8 at .5 rounding boundaries).  Capping the ISA below FMA keeps the
    # golden comparison pixel-exact.
    os.environ["XLA_FLAGS"] = (
        _flags0
        + " --xla_force_host_platform_device_count=8 --xla_cpu_max_isa=SSE4_2"
    ).strip()

import jax  # noqa: E402

if _backend == "cpu":
    jax.config.update("jax_platforms", "cpu")
# otherwise leave the session backend (e.g. the TPU) in place; tests that
# need an 8-device mesh will fail fast rather than silently diverge

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
