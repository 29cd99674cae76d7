from paintfe_tpu.core.blend import BlendMode, blend_u8  # noqa: F401
from paintfe_tpu.core.composite import composite_stack  # noqa: F401
from paintfe_tpu.core.canvas import Canvas, Layer  # noqa: F401
