from paintfe_tpu.scripting.engine import (  # noqa: F401
    ScriptError,
    ScriptMessage,
    apply_canvas_ops,
    compile_script,
    execute_script_async,
    execute_script_sync,
)
from paintfe_tpu.scripting.api import CanvasOpRequest, ScriptContext  # noqa: F401
