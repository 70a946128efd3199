"""Optional experiment-tracker sinks.

The reference hard-depends on Weights & Biases (src/train.py:111-153).  Here
tracking is a pluggable sink protocol: CSV is always on (train.metrics),
W&B attaches only if the package is installed and configured.
"""

from __future__ import annotations

from typing import Any, Protocol

from maunet_tpu.utils.logging import get_logger

log = get_logger(__name__)


class Tracker(Protocol):
    def log(self, row: dict[str, Any], step: int | None = None) -> None: ...
    def log_image(self, key: str, image_path: str,
                  step: int | None = None) -> None: ...
    def log_table(self, key: str, dataframe: Any,
                  step: int | None = None) -> None: ...
    def finish(self) -> None: ...


class NullTracker:
    def log(self, row, step=None):
        pass

    def log_image(self, key, image_path, step=None):
        pass

    def log_table(self, key, dataframe, step=None):
        pass

    def finish(self):
        pass


class WandbTracker:
    """W&B sink (capability parity with reference run naming/tag taxonomy,
    src/train.py:142-153; image logging of live prediction plots,
    src/train.py:266-280; table logging of evaluation summaries,
    test/evaluate.py:314-359; sensitivity figures,
    test/metadata_sensitivity.py:685-712).  Degrades to a no-op if wandb is
    unavailable."""

    def __init__(self, project: str | None = None, group: str | None = None,
                 name: str | None = None, config: dict | None = None,
                 tags: list[str] | None = None):
        try:
            import wandb
        except ImportError:
            log.warning("wandb not installed — tracking disabled.")
            self._run = None
            return
        self._run = wandb.init(project=project, group=group, name=name,
                               config=config, tags=tags, reinit=True)

    def log(self, row, step=None):
        if self._run is not None:
            self._run.log(row, step=step)

    def log_image(self, key, image_path, step=None):
        if self._run is not None:
            import wandb

            self._run.log({key: wandb.Image(image_path)}, step=step)

    def log_table(self, key, dataframe, step=None):
        if self._run is not None:
            import wandb

            self._run.log({key: wandb.Table(dataframe=dataframe)}, step=step)

    def finish(self):
        if self._run is not None:
            self._run.finish()


def make_emb_tag(temporal: bool, metadata: bool) -> str:
    """Study-name embedding suffix encoding (reference src/train.py:79-87)."""
    if temporal and metadata:
        return "emb"
    if temporal:
        return "tempemb"
    if metadata:
        return "metaemb"
    return "noemb"
