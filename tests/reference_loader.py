"""Import the read-only reference PyTorch model for parity testing.

We import /root/reference/src/model.py directly (stubbing its loguru
dependency) so parity tests compare against the *actual* reference
implementation, not a re-transcription.  Tests using this must skip when the
reference tree is unavailable.
"""

import importlib.util
import os
import sys
import types

REFERENCE_MODEL = "/root/reference/src/model.py"


def reference_available() -> bool:
    return os.path.exists(REFERENCE_MODEL)


def load_reference_model_module():
    if "loguru" not in sys.modules:
        stub = types.ModuleType("loguru")

        class _Logger:
            def __getattr__(self, name):
                return lambda *a, **k: None

        stub.logger = _Logger()
        sys.modules["loguru"] = stub

    spec = importlib.util.spec_from_file_location("reference_model", REFERENCE_MODEL)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module
