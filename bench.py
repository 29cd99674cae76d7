"""Benchmark: the BASELINE headline — fused 4K blur+adjust+flatten chain.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >10 GPix/s on the fused 4K chain.
Runs on whatever backend JAX selects (real TPU under the driver).
"""

import functools
import json
import sys
import time

import numpy as np


def _measure(run_k, img_d, ov_d, salt, k_lo, k_hi):
    import jax.numpy as jnp

    def median_of(k, reps=3):
        int(run_k(img_d, ov_d, jnp.uint8(next(salt)), k))
        ts = []
        for _ in range(reps):
            sv = jnp.uint8(next(salt))
            t0 = time.perf_counter()
            int(run_k(img_d, ov_d, sv, k))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    return (median_of(k_hi) - median_of(k_lo)) / (k_hi - k_lo)


def table():
    """Extended per-op honest numbers (same in-program slope methodology).
    Not the driver contract — run `python bench.py --table` by hand."""
    import jax
    import jax.numpy as jnp

    from paintfe_tpu.core.blend import BlendMode, blend_u8
    from paintfe_tpu.core.composite import composite_stack_static
    from paintfe_tpu.ops import filters
    from paintfe_tpu.ops.fused_chain import fused_chain, fused_chain_kernel
    from paintfe_tpu.ops.pallas_kernels import composite_stack_pallas, gaussian_blur_fused

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    img_d = jax.device_put(np.asarray(rng.integers(0, 256, (h, w, 4), np.uint8)))
    ov_d = jax.device_put(np.asarray(rng.integers(0, 256, (h, w, 4), np.uint8)))
    salt = iter(range(10000))

    cases = [
        ("chain mega-kernel", lambda a, x: fused_chain_kernel(a, x)),
        ("chain planar 2-kernel", lambda a, x: fused_chain(a, x)),
        ("blur pallas fused", lambda a, x: gaussian_blur_fused(x, 2.0)),
        ("blur xla separable", lambda a, x: filters.gaussian_blur(x, 2.0)),
        ("median 3x3 network", lambda a, x: filters.median(x, 1)),
        ("blend soft-light", lambda a, x: blend_u8(a, x, int(BlendMode.SOFT_LIGHT), 0.6)),
    ]
    for name, f in cases:
        @functools.partial(jax.jit, static_argnums=3)
        def run_k(img, ov, sv, k, f=f):
            ov = ov.at[0, 0, 0].set(sv)
            out = jax.lax.fori_loop(0, k, lambda i, x: f(img, x), ov)
            return out.astype(jnp.uint32).sum()

        per = _measure(run_k, img_d, ov_d, salt, 5, 35)
        print(f"{name:24s} {per * 1000:7.2f} ms/4K-frame  {h * w / per / 1e9:6.2f} GPix/s")

    # Rank/histogram family.  oil uses the k-loop; crystallize's routed
    # accumulator doubles the live set inside a fori_loop (HBM pressure),
    # so it rotates distinct pre-uploaded inputs instead.
    import time as _t

    from paintfe_tpu.ops.effects import artistic, distort

    @functools.partial(jax.jit, static_argnums=3)
    def run_oil_k(img, ov, sv, k):
        ov = ov.at[0, 0, 0].set(sv)
        out = jax.lax.fori_loop(0, k,
                                lambda i, x: artistic.oil_painting(x, 3, 20), ov)
        return out.astype(jnp.uint32).sum()

    per = _measure(run_oil_k, img_d, ov_d, salt, 1, 4)
    print(f"{'oil painting r3 l20':24s} {per * 1000:7.2f} ms/4K-frame  "
          f"{h * w / per / 1e9:6.2f} GPix/s")

    base = np.asarray(jax.device_get(img_d))
    variants = []
    for i in range(5):
        v = base.copy()
        v[0, 0, 0] = i
        variants.append(jax.device_put(v))
    jax.block_until_ready(variants)
    int(jnp.asarray(distort.crystallize(variants[0], 16.0))
        .astype(jnp.uint32).sum())
    cts = []
    for vd in variants[1:]:
        t0 = _t.perf_counter()
        int(jnp.asarray(distort.crystallize(vd, 16.0)).astype(jnp.uint32).sum())
        cts.append(_t.perf_counter() - t0)
    cts.sort()
    per = cts[len(cts) // 2]
    print(f"{'crystallize 16':24s} {per * 1000:7.2f} ms/4K-frame  "
          f"{h * w / per / 1e9:6.2f} GPix/s")

    # Warp family (liquify/mesh-warp field): the Pallas sweep-gather kernel
    # vs the XLA gather formulation.
    import time as _time

    from paintfe_tpu.ops import transform as tfm
    from paintfe_tpu.ops.warp_kernel import gather_bilinear_u8

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    sx_np = (xx - 20 * np.sin(yy / 97.0)).astype(np.float32)
    sy_np = (yy - 20 * np.cos(xx / 131.0)).astype(np.float32)

    # The kernel path inherently crosses the host each call (the bucket
    # plan syncs two scalars), so the in-program k-loop cannot apply;
    # instead rotate through pre-uploaded DISTINCT field variants (sub-ulp
    # jitter keeps the buckets identical) so no layer can elide repeats,
    # and consume a scalar from each result.
    variants = [
        (jax.device_put(sx_np + np.float32(1e-4) * i),
         jax.device_put(sy_np - np.float32(1e-4) * i))
        for i in range(5)
    ]
    jax.block_until_ready(variants)
    int(jnp.asarray(gather_bilinear_u8(img_d, *variants[0], interpret=False))
        .astype(jnp.uint32).sum())
    ts = []
    for sxv, syv in variants[1:]:
        t0 = _time.perf_counter()
        out = gather_bilinear_u8(img_d, sxv, syv, interpret=False)
        int(jnp.asarray(out).astype(jnp.uint32).sum())
        ts.append(_time.perf_counter() - t0)
    ts.sort()
    per = ts[len(ts) // 2]
    print(f"{'warp pallas sweep-gather':24s} {per * 1000:7.2f} ms/4K-frame  "
          f"{h * w / per / 1e9:6.2f} GPix/s")

    # XLA gather row: standard salted in-program k-chain (output feeds the
    # next frame's input; constant displacement field).
    xla_warp = tfm._warp_fn(h, w, h, w)
    disp_d = jax.device_put(
        np.stack([xx - sx_np, yy - sy_np], axis=-1).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=3)
    def run_warp_k(img, disp, sv, k):
        img = img.at[0, 0, 0].set(sv)
        out = jax.lax.fori_loop(0, k, lambda i, x: xla_warp(x, disp), img)
        return out.astype(jnp.uint32).sum()

    def _wmed(k, reps=3):
        int(run_warp_k(img_d, disp_d, jnp.uint8(next(salt)), k))
        ws = []
        for _ in range(reps):
            sv = jnp.uint8(next(salt))
            t0 = _time.perf_counter()
            int(run_warp_k(img_d, disp_d, sv, k))
            ws.append(_time.perf_counter() - t0)
        ws.sort()
        return ws[len(ws) // 2]

    per = (_wmed(4) - _wmed(1)) / 3
    print(f"{'warp xla gather':24s} {per * 1000:7.2f} ms/4K-frame  "
          f"{h * w / per / 1e9:6.2f} GPix/s")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _chain

    h, w = 2160, 3840  # 4K
    rng = np.random.default_rng(0)
    img = np.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))
    overlay = np.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))

    step = _chain()
    img_d = jax.device_put(img)
    ov_d = jax.device_put(overlay)

    # Honest timing on an async/tunneled device: run the k-frame dependent
    # chain INSIDE one XLA program (fori_loop feeding each frame's output to
    # the next frame's overlay input) and consume the result with a scalar
    # sum, so no layer of the stack can cache, overlap, or elide frames.
    # The per-frame cost is the slope between two k values, which cancels
    # the constant dispatch/transport overhead.
    @functools.partial(jax.jit, static_argnums=3)
    def run_k(img, ov, salt, k):
        ov = ov.at[0, 0, 0].set(salt)  # unique work per call — defeats any
        out = jax.lax.fori_loop(0, k, lambda i, x: step(img, x), ov)
        return out.astype(jnp.uint32).sum()

    # NOTE: timing must consume the scalar (int(...)) — on remote/tunneled
    # runtimes block_until_ready() can return before the execution actually
    # retires; fetching the value is the only true synchronization.
    k_lo, k_hi = 5, 65
    salt = iter(range(1000))
    int(run_k(img_d, ov_d, jnp.uint8(next(salt)), k_lo))
    int(run_k(img_d, ov_d, jnp.uint8(next(salt)), k_hi))

    def median_of(k, reps=3):
        # discard one call (post-compile/idle stragglers), then median
        int(run_k(img_d, ov_d, jnp.uint8(next(salt)), k))
        ts = []
        for _ in range(reps):
            sv = jnp.uint8(next(salt))
            t0 = time.perf_counter()
            int(run_k(img_d, ov_d, sv, k))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    per_frame = (median_of(k_hi) - median_of(k_lo)) / (k_hi - k_lo)
    gpix_s = h * w / per_frame / 1e9
    # BASELINE.json's >10 GPix/s target is for a v5e-8 slice; this bench runs
    # on however many local devices exist (one chip under the driver), and
    # the workload shards linearly per image, so compare against the
    # per-chip share of the target.
    n_dev = len(jax.local_devices())
    target = 10.0 * min(n_dev, 8) / 8.0
    print(json.dumps({
        "metric": (
            "fused 4K blur+adjust+flatten chain throughput "
            f"({n_dev} chip(s); baseline 10 GPix/s is v5e-8, "
            f"pro-rated target {target:.2f})"
        ),
        "value": round(gpix_s, 3),
        "unit": "GPix/s",
        "vs_baseline": round(gpix_s / target, 3),
    }))


if __name__ == "__main__":
    if "--table" in sys.argv:
        table()
    else:
        main()
