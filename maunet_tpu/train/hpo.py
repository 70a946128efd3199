"""Hyperparameter-optimization studies.

Capability parity with the reference's Optuna wrapper (src/train.py:333-347):
named studies with persistent storage, median pruning on intermediate
validation values, failed-trial re-enqueue on resume, and a
suggest_float/int/categorical API (seeded random search).  Storage is a
plain JSON file per study (optuna and its SQLite storage are not available
in this image); the public surface mirrors optuna's so swapping back is
mechanical.
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import asdict, dataclass, field
from typing import Any, Callable

from maunet_tpu.utils.logging import get_logger

log = get_logger(__name__)

RUNNING, COMPLETE, PRUNED, FAIL = "RUNNING", "COMPLETE", "PRUNED", "FAIL"


class TrialPruned(Exception):
    pass


@dataclass
class TrialRecord:
    number: int
    state: str = RUNNING
    value: float | None = None
    params: dict[str, Any] = field(default_factory=dict)
    intermediate: dict[str, float] = field(default_factory=dict)  # step → value


class Trial:
    def __init__(self, study: "Study", record: TrialRecord):
        self.study = study
        self.record = record
        # Stable across processes (builtin str hashing is salted per run).
        import hashlib

        digest = hashlib.sha256(
            f"{study.study_name}:{record.number}".encode()).digest()
        self._rng = random.Random(int.from_bytes(digest[:8], "big"))
        self._enqueued = dict(record.params)

    @property
    def number(self) -> int:
        return self.record.number

    @property
    def params(self) -> dict[str, Any]:
        return self.record.params

    # -- suggest API (seeded random search; honors re-enqueued params) ----
    def _remember(self, name: str, value):
        self.record.params[name] = value
        return value

    def suggest_float(self, name: str, low: float, high: float, log: bool = False):
        if name in self._enqueued:
            return self._remember(name, self._enqueued[name])
        if log:
            import math

            value = math.exp(self._rng.uniform(math.log(low), math.log(high)))
        else:
            value = self._rng.uniform(low, high)
        return self._remember(name, value)

    def suggest_int(self, name: str, low: int, high: int):
        if name in self._enqueued:
            return self._remember(name, int(self._enqueued[name]))
        return self._remember(name, self._rng.randint(low, high))

    def suggest_categorical(self, name: str, choices: list):
        if name in self._enqueued:
            return self._remember(name, self._enqueued[name])
        return self._remember(name, self._rng.choice(list(choices)))

    # -- pruning ----------------------------------------------------------
    def report(self, value: float, step: int) -> None:
        self.record.intermediate[str(step)] = float(value)
        self.study._save()

    def should_prune(self) -> bool:
        return self.study.pruner.should_prune(self.study, self.record)


class MedianPruner:
    """Prune if the latest reported value is worse than the median of the
    values other trials reported at the same step (optuna semantics)."""

    def __init__(self, n_startup_trials: int = 5, n_warmup_steps: int = 0):
        self.n_startup_trials = n_startup_trials
        self.n_warmup_steps = n_warmup_steps

    def should_prune(self, study: "Study", record: TrialRecord) -> bool:
        if not record.intermediate:
            return False
        step = max(int(s) for s in record.intermediate)
        if step < self.n_warmup_steps:
            return False
        value = record.intermediate[str(step)]
        peers = []
        for t in study.trials:
            if t.number == record.number or t.state not in (COMPLETE, PRUNED):
                continue
            if str(step) in t.intermediate:
                peers.append(t.intermediate[str(step)])
        if len(peers) < self.n_startup_trials:
            return False
        peers.sort()
        median = peers[len(peers) // 2] if len(peers) % 2 else (
            (peers[len(peers) // 2 - 1] + peers[len(peers) // 2]) / 2)
        worse = value > median if study.direction == "minimize" else value < median
        return worse


class Study:
    def __init__(self, study_name: str, storage_dir: str = "reports/training_hpo",
                 direction: str = "minimize", pruner: MedianPruner | None = None,
                 load_if_exists: bool = True):
        self.study_name = study_name
        self.direction = direction
        self.pruner = pruner or MedianPruner()
        self.storage_path = os.path.join(storage_dir, f"{study_name}.json")
        os.makedirs(storage_dir, exist_ok=True)
        self.trials: list[TrialRecord] = []
        if load_if_exists and os.path.exists(self.storage_path):
            with open(self.storage_path) as f:
                data = json.load(f)
            self.trials = [TrialRecord(**t) for t in data.get("trials", [])]
            log.info(f"Resumed study '{study_name}' with {len(self.trials)} trials.")

    def _save(self) -> None:
        tmp = self.storage_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"study_name": self.study_name,
                       "direction": self.direction,
                       "trials": [asdict(t) for t in self.trials]}, f, indent=2)
        os.replace(tmp, self.storage_path)

    def enqueue_trial(self, params: dict[str, Any]) -> None:
        self._queue = getattr(self, "_queue", [])
        self._queue.append(params)

    def optimize(self, objective: Callable[[Trial], float], n_trials: int) -> None:
        # Re-enqueue failed trials (reference src/train.py:343-346).
        for t in self.trials:
            if t.state == FAIL:
                self.enqueue_trial(t.params)
        queue = list(getattr(self, "_queue", []))
        self._queue = []

        for _ in range(n_trials):
            number = len(self.trials)
            record = TrialRecord(number=number,
                                 params=queue.pop(0) if queue else {})
            self.trials.append(record)
            trial = Trial(self, record)
            try:
                value = objective(trial)
                record.state = COMPLETE
                record.value = float(value)
            except TrialPruned:
                record.state = PRUNED
                vals = record.intermediate.values()
                record.value = min(vals) if vals else None
                log.info(f"Trial {number} pruned.")
            except Exception as e:
                record.state = FAIL
                log.error(f"Trial {number} failed: {e!r}")
            self._save()

    @property
    def best_trial(self) -> TrialRecord:
        done = [t for t in self.trials if t.state == COMPLETE and t.value is not None]
        if not done:
            raise ValueError("No completed trials.")
        key = (lambda t: t.value) if self.direction == "minimize" else (lambda t: -t.value)
        return min(done, key=key)


def create_study(study_name: str, storage_dir: str = "reports/training_hpo",
                 direction: str = "minimize", load_if_exists: bool = True,
                 pruner: MedianPruner | None = None) -> Study:
    return Study(study_name, storage_dir, direction, pruner, load_if_exists)
