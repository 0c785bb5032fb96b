"""wandb reporting with a dependency-free offline fallback.

The reference gates wandb behind ``--report-to wandb`` (training/main.py:
119-121,388-411) and logs each train/eval metric window via ``wandb.log``
(training/train.py:241-248). The wandb package is not installed in every
environment, so :func:`init_wandb` returns the real run when ``import
wandb`` works and otherwise an :class:`OfflineWandbRun` that records the
same stream to plain files under ``<logs>/<name>/wandb-offline/``:

- ``config.json``   — the run config (flattened argparse namespace)
- ``history.jsonl`` — one JSON object per ``log()`` call (with ``_step``)
- ``summary.json``  — last value per key, written on ``finish()``

This keeps ``--report-to wandb`` a first-class, always-available flag: the
metric stream survives as data a later wandb import (or any analysis
script) can replay, instead of the flag silently degrading to a warning.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional


def _jsonable(v: Any):
    try:
        json.dumps(v)
        return v
    except (TypeError, ValueError):
        return repr(v)


class OfflineWandbRun:
    """File-backed stand-in for a ``wandb`` run (same call surface)."""

    def __init__(self, out_dir: str, config: Optional[Dict[str, Any]] = None):
        self.dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._history_path = os.path.join(out_dir, "history.jsonl")
        self._history = open(self._history_path, "a")
        self._summary: Dict[str, Any] = {}
        self._step = 0
        if config is not None:
            with open(os.path.join(out_dir, "config.json"), "w") as fh:
                json.dump({k: _jsonable(v) for k, v in config.items()}, fh,
                          indent=2, sort_keys=True)

    # -- wandb API surface -------------------------------------------------
    def log(self, data: Dict[str, Any], step: Optional[int] = None) -> None:
        if step is not None:
            self._step = int(step)
        row = {"_step": self._step}
        row.update({k: _jsonable(v) for k, v in data.items()})
        self._history.write(json.dumps(row) + "\n")
        self._history.flush()
        self._summary.update(row)
        if step is None:
            self._step += 1

    def add_scalar(self, name: str, value, step: Optional[int] = None) -> None:
        """TB-SummaryWriter surface, so the run can be passed anywhere a
        tensorboard writer is accepted (e.g. the SAE pipeline's logger)."""
        self.log({name: float(value)}, step=step)

    def watch(self, *args, **kwargs) -> None:  # model gradient watching: n/a
        pass

    def save(self, *args, **kwargs) -> None:
        pass

    def finish(self) -> None:
        with open(os.path.join(self.dir, "summary.json"), "w") as fh:
            json.dump(self._summary, fh, indent=2, sort_keys=True)
        self._history.close()


class ScalarFanout:
    """Fan one ``add_scalar`` stream out to several sinks (TB writer +
    wandb run), as the reference SAE pipeline logs to both
    (sparse_autoencoder pipeline.py:142-143,164-175)."""

    def __init__(self, *sinks):
        self.sinks = [s for s in sinks if s is not None]

    def add_scalar(self, name: str, value, step: Optional[int] = None) -> None:
        for s in self.sinks:
            if hasattr(s, "add_scalar"):
                s.add_scalar(name, value, step)
            else:  # the real wandb module
                s.log({name: float(value)}, step=step)


def init_wandb(args, log_base_path: str, num_train_samples: Optional[int] = None):
    """Start a wandb run (real package if importable, offline otherwise).

    Mirrors the reference init (training/main.py:388-411): project/name/id
    from the experiment name, ``resume='auto'``-style continuation, the
    full args namespace as config, and the train-set size tagged on.
    Returns an object with ``log(dict, step=)`` and ``finish()``.
    """
    config = dict(vars(args))
    if num_train_samples is not None:
        config["train_sz"] = num_train_samples
    try:
        import wandb  # type: ignore

        if not callable(getattr(wandb, "init", None)):
            # e.g. a test stub parked in sys.modules for reference imports
            raise ImportError("wandb module has no usable init()")
        run_name = getattr(args, "name", None)
        wandb.init(
            project=getattr(args, "wandb_project_name", "open-clip"),
            name=run_name,
            id=run_name,
            notes=getattr(args, "wandb_notes", ""),
            tags=[],
            resume="auto" if getattr(args, "resume", None) == "latest" else None,
            config=config,
        )
        logging.info("wandb initialized (project=%s)",
                     getattr(args, "wandb_project_name", "open-clip"))
        return wandb
    except Exception as exn:  # unavailable/unusable/offline-init failure
        out_dir = os.path.join(log_base_path, "wandb-offline")
        logging.info(
            "wandb unavailable (%s); recording the metric stream offline to %s",
            exn, out_dir,
        )
        return OfflineWandbRun(out_dir, config=config)
