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


def make_reference_checkpoint(path: str, model_type: str = "unet",
                              seq_len: int = 64, base_filters: int = 4,
                              temporal_dim: int = 4, meta_dim: int = 6,
                              lstm_dim: int = 8, trial_id: int = 7,
                              study_name: str = "ref-emb") -> str:
    """Save a small reference-format .pth checkpoint for integration tests."""
    import torch

    ref = load_reference_model_module()
    torch.manual_seed(0)
    model = ref.UrbanPredictor(
        model_type=model_type, spatial_channels=23, seq_len=seq_len,
        temporal_dim=temporal_dim, meta_features=8, meta_dim=meta_dim,
        lstm_dim=lstm_dim, out_channels=2, base_filters=base_filters,
        temporal_embeddings=True, metadata_embeddings=True)
    torch.save({
        "epoch": 3, "step": 100, "model_state_dict": model.state_dict(),
        "loss": 0.5,
        "hyperparameters": {
            "batch_size": 4, "temporal_dim": temporal_dim, "meta_dim": meta_dim,
            "lstm_hidden": lstm_dim, "base_filters": base_filters,
            "model_type": model_type,
            "temporal_embeddings": True, "metadata_embeddings": True,
        },
        "model_type": model_type, "study_name": study_name, "trial_id": trial_id,
        "metadata_input_length": 8,
    }, path)
    return path
