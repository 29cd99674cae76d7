"""Sharded CLI batch runner: the reference's serial glob loop (cli.rs:159)
re-expressed as mesh-sharded batches.

Strategy: trace the script's op chain once (pipeline.trace_script); bucket
inputs by dimensions so each bucket is one static-shape [N, H, W, 4] batch;
run each bucket through the fused chain sharded over the device mesh;
encode results on the host.  Scripts that touch pixels directly fall back
to the per-image interpreter path, still with keep-going semantics.
"""

from __future__ import annotations

import pathlib
import sys
import time
from collections import defaultdict
from typing import List, Optional

import numpy as np

from paintfe_tpu.io import codecs
from paintfe_tpu.parallel.pipeline import NotVectorizable, run_batch, trace_script


def run_sharded_batch(inputs: List[pathlib.Path], args, fmt: str,
                      script_source: Optional[str]) -> int:
    from paintfe_tpu.cli import build_output_path, run_one

    ops = []
    if script_source:
        try:
            ops = trace_script(script_source)
        except NotVectorizable as e:
            if args.verbose:
                print(f"note: script uses per-pixel API ({e}); running per-image")
            return _fallback_serial(inputs, args, fmt, script_source)
        except Exception as e:
            print(f"  error: script error: {e}", file=sys.stderr)
            return 1

    any_failure = False
    t0 = time.time()

    # Load everything (host IO) with the decode-ahead thread pool,
    # bucketing by shape for static-shape batches.
    from paintfe_tpu.parallel.prefetch import prefetch_images

    buckets = defaultdict(list)  # (h, w) -> [(index, image)]
    loaded = {}
    for idx, (path, img) in enumerate(prefetch_images(inputs)):
        if isinstance(img, Exception):
            print(f"  error: {img}", file=sys.stderr)
            any_failure = True
            continue
        loaded[idx] = img
        buckets[img.shape[:2]].append(idx)

    processed = {}
    for shape, idxs in buckets.items():
        batch = np.stack([loaded[i] for i in idxs])
        out = run_batch(batch, ops)
        for k, i in enumerate(idxs):
            processed[i] = out[k]

    for idx, path in enumerate(inputs):
        if idx not in processed:
            continue
        output_path = build_output_path(path, args.output, args.output_dir, fmt)
        try:
            codecs.save_image(
                processed[idx], output_path, fmt, quality=args.quality,
                webp_lossless=not args.webp_lossy,
                tiff_compression=args.tiff_compression,
            )
            if args.verbose:
                print(f"  -> {output_path}")
        except codecs.CodecError as e:
            print(f"  error: {e}", file=sys.stderr)
            any_failure = True

    if args.verbose:
        n = len(processed)
        dt = time.time() - t0
        print(f"sharded batch: {n} images in {dt:.2f}s ({n / max(dt, 1e-9):.1f} img/s)")
    return 1 if any_failure else 0


def _fallback_serial(inputs, args, fmt, script_source) -> int:
    from paintfe_tpu.cli import build_output_path, run_one

    any_failure = False
    for i, input_path in enumerate(inputs):
        output_path = build_output_path(input_path, args.output, args.output_dir, fmt)
        try:
            run_one(
                input_path, output_path, script_source, fmt, args.quality,
                not args.webp_lossy, args.tiff_compression, args.flatten,
                args.verbose,
            )
        except Exception as e:
            print(f"  error: {e}", file=sys.stderr)
            any_failure = True
    return 1 if any_failure else 0
