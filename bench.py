"""Benchmark: the BASELINE headline — fused 4K blur+adjust+flatten chain.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >10 GPix/s on the fused 4K chain.
Runs on whatever backend JAX selects (real TPU under the driver).
"""

import json
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _chain

    h, w = 2160, 3840  # 4K
    rng = np.random.default_rng(0)
    img = np.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))
    overlay = np.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))

    step = jax.jit(_chain())
    img_d = jax.device_put(img)
    ov_d = jax.device_put(overlay)

    # warmup / compile
    out = step(img_d, ov_d)
    out.block_until_ready()

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(img_d, ov_d)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    pixels = h * w * iters
    gpix_s = pixels / dt / 1e9
    print(json.dumps({
        "metric": "fused 4K blur+adjust+flatten chain throughput",
        "value": round(gpix_s, 3),
        "unit": "GPix/s",
        "vs_baseline": round(gpix_s / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
