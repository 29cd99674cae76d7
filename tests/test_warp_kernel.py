"""Displacement-aware Pallas gather kernel: parity with the XLA paths.

Runs in interpret mode on the CPU harness; Mosaic compilation of the same
kernel is covered by tests/test_tpu_smoke.py on-chip.  All kernel cases
share one image size and land in the same bucket so the (large) interpret
trace is built once per mode (see _gather_fn's lru_cache).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paintfe_tpu.ops import transform as tfm
from paintfe_tpu.ops.effects.distort import sample_bilinear
from paintfe_tpu.ops.warp_kernel import (S_BUCKETS, WH_BUCKETS,
                                         gather_bilinear_u8, plan)
from paintfe_tpu.utils.quant import round_u8

H, W = 64, 280  # one tile-row, two tile-cols; shared across kernel cases


def _src(seed=0):
    return np.asarray(
        np.random.default_rng(seed).integers(0, 256, (H, W, 4), np.uint8))


def _grids():
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    return xx, yy


def _ref_zero(src, sx, sy):
    xx, yy = _grids()
    disp = np.stack([xx - sx, yy - sy], axis=-1).astype(np.float32)
    return np.asarray(tfm._warp_fn(H, W, src.shape[0], src.shape[1])(src, disp))


def _ref_clamp(src, sx, sy):
    f = jax.jit(lambda i, a, b: round_u8(sample_bilinear(i, a, b)))
    return np.asarray(f(src, jnp.asarray(sx), jnp.asarray(sy)))


# all fields small enough to land in the (WH, S) = smallest buckets
FIELDS = {
    "identity": lambda xx, yy: (xx, yy),
    "const_shift": lambda xx, yy: (xx - 7.25, yy + 3.5),
    "swirl": lambda xx, yy: (xx - 4 * np.sin(yy / 13.0),
                             yy - 4 * np.cos(xx / 17.0)),
    "deep_oob": lambda xx, yy: (xx - 60.0, yy - 60.0),
    "half_px": lambda xx, yy: (xx - 0.5, yy - 0.5),
}


def test_zero_mode_bit_identical():
    src = _src()
    xx, yy = _grids()
    for name, f in FIELDS.items():
        sx, sy = (v.astype(np.float32) for v in f(xx, yy))
        got = gather_bilinear_u8(src, sx, sy, mode="zero", interpret=True)
        assert got is not None, f"{name} unexpectedly infeasible"
        assert np.array_equal(np.asarray(got), _ref_zero(src, sx, sy)), name


def test_clamp_mode_bit_identical():
    src = _src(seed=1)
    xx, yy = _grids()
    for name in ("identity", "swirl", "deep_oob"):
        sx, sy = (v.astype(np.float32) for v in FIELDS[name](xx, yy))
        got = gather_bilinear_u8(src, sx, sy, mode="clamp", interpret=True)
        assert got is not None
        assert np.array_equal(np.asarray(got), _ref_clamp(src, sx, sy)), name


def test_random_field_fuzz():
    rng = np.random.default_rng(7)
    xx, yy = _grids()
    for trial in range(2):
        src = _src(seed=10 + trial)
        sx = (xx + rng.normal(0, 3, (H, W))).astype(np.float32)
        sy = (yy + rng.normal(0, 3, (H, W))).astype(np.float32)
        got = gather_bilinear_u8(src, sx, sy, interpret=True)
        if got is None:
            continue  # rough fields may exceed the buckets; that's the contract
        assert np.array_equal(np.asarray(got), _ref_zero(src, sx, sy)), \
            f"trial {trial} diverged"


def test_infeasible_field_reports_none():
    # a shuffle-like field: source columns jump by hundreds within a tile
    src = _src()
    xx, yy = _grids()
    sx = ((xx * 7919.0) % W).astype(np.float32)
    sy = yy.astype(np.float32)
    assert gather_bilinear_u8(src, sx, sy, interpret=True) is None


def test_cached_bucket_fast_path_identical():
    """Second call with the same geometry takes the fused checked path
    (no pre-kernel plan sync) and must stay bit-identical; a field that
    outgrows the cached buckets falls back to a full re-plan."""
    from paintfe_tpu.ops import warp_kernel as wk

    src = _src(seed=3)
    xx, yy = _grids()
    sx, sy = (v.astype(np.float32) for v in FIELDS["swirl"](xx, yy))
    first = gather_bilinear_u8(src, sx, sy, mode="zero", interpret=True)
    key = (H, W, H, W, "zero", True)
    assert key in wk._BUCKET_CACHE  # the plan's buckets were cached
    second = gather_bilinear_u8(src, sx, sy, mode="zero", interpret=True)
    assert np.array_equal(np.asarray(first), np.asarray(second))
    assert np.array_equal(np.asarray(second), _ref_zero(src, sx, sy))
    # same geometry, infeasible field: checked path reports not-ok and the
    # re-plan returns None + evicts the stale bucket entry
    sx_bad = ((xx * 7919.0) % W).astype(np.float32)
    assert gather_bilinear_u8(src, sx_bad, yy, mode="zero",
                              interpret=True) is None
    assert key not in wk._BUCKET_CACHE


def test_defer_check_mode():
    """defer_check=True returns (out, ok) with no host sync; out matches
    the synchronous path bit-for-bit when ok is True, and an infeasible
    field yields (None, None)."""
    src = _src(seed=4)
    xx, yy = _grids()
    sx, sy = (v.astype(np.float32) for v in FIELDS["const_shift"](xx, yy))
    sync = gather_bilinear_u8(src, sx, sy, mode="zero", interpret=True)
    out, ok = gather_bilinear_u8(src, sx, sy, mode="zero", interpret=True,
                                 defer_check=True)
    assert bool(ok)
    assert np.array_equal(np.asarray(out), np.asarray(sync))
    # infeasible field: either (None, None) from a fresh plan, or a
    # deferred ok=False from the cached-bucket program — both tell the
    # caller the output is unusable
    sx_bad = ((xx * 7919.0) % W).astype(np.float32)
    out2, ok2 = gather_bilinear_u8(src, sx_bad, yy, mode="zero",
                                   interpret=True, defer_check=True)
    assert (out2 is None and ok2 is None) or not bool(ok2)


def test_plan_buckets_monotonic():
    xx, yy = _grids()
    small = plan(xx - 2, yy - 2, H, W)
    assert small is not None
    assert small[2] == WH_BUCKETS[0] and small[3] == S_BUCKETS[0]
    big = plan(xx - 40 * np.sin(yy / 11.0), yy, H, W)
    assert big is not None
    assert big[3] >= S_BUCKETS[1]


def test_planned_path_identical_and_sync_free():
    """gather_bilinear_u8_planned: first call plans (one host sync) and
    caches device-resident windows per plan_key; later calls must reuse
    them (no plan) and stay bit-identical.  Infeasible keys cache the
    infeasibility so the fallback skips the plan RTT too."""
    from unittest import mock

    from paintfe_tpu.ops import warp_kernel as wk

    src = _src(seed=5)
    xx, yy = _grids()
    sx, sy = (v.astype(np.float32) for v in FIELDS["swirl"](xx, yy))
    key = ("test-field", 1.0)
    first = wk.gather_bilinear_u8_planned(src, sx, sy, key, mode="zero",
                                          interpret=True)
    assert first is not None
    assert np.array_equal(np.asarray(first), _ref_zero(src, sx, sy))
    # repeat call: plan() must NOT run again
    with mock.patch.object(wk, "plan",
                           side_effect=AssertionError("re-planned")):
        second = wk.gather_bilinear_u8_planned(src, sx, sy, key,
                                               mode="zero", interpret=True)
    assert np.array_equal(np.asarray(first), np.asarray(second))

    # infeasible field: None once, then cached None without re-planning
    sx_bad = ((xx * 7919.0) % W).astype(np.float32)
    bad_key = ("test-bad", 2.0)
    assert wk.gather_bilinear_u8_planned(src, sx_bad, yy, bad_key,
                                         interpret=True) is None
    with mock.patch.object(wk, "plan",
                           side_effect=AssertionError("re-planned")):
        assert wk.gather_bilinear_u8_planned(src, sx_bad, yy, bad_key,
                                             interpret=True) is None
