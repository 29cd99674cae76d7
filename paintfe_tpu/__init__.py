"""paintfe_tpu — a TPU-native image-processing framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of PaintFE
(reference: a Rust/wgpu raster editor): layered compositing with 25 blend
modes, a LUT-fused adjustment stack, convolution/neighborhood filters,
geometric warps (Liquify / Catmull-Rom mesh warp), a sandboxed scripting
engine, and a headless CLI batch mode whose glob workload shards across a
TPU device mesh.

Design stance (TPU-first, not a port):
  * images are HBM-resident dense arrays, u8 at rest, f32 in kernels
  * every op is a pure jittable function (image, mask, params) -> image
  * effect chains are traced once and fused by XLA
  * the batch axis (many images) shards over a `jax.sharding.Mesh`
"""

__version__ = "0.1.0"

from paintfe_tpu.core.blend import BlendMode  # noqa: F401
from paintfe_tpu.core.canvas import Canvas, Layer  # noqa: F401
from paintfe_tpu.core.project import Project  # noqa: F401
