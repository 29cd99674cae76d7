from paintfe_tpu.tools.brush import Brush, BrushMode  # noqa: F401
