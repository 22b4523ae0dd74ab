"""Structured logging: stdlib logger + JSONL run logs.

Replaces the reference's ad-hoc prints and result CSVs (SURVEY.md §5.5) with
machine-readable per-run records.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logging.getLogger("probing_rag_tpu").handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        root = logging.getLogger("probing_rag_tpu")
        root.addHandler(handler)
        root.setLevel(logging.INFO)
    return logger


class JsonlWriter:
    """Append-only JSONL record writer with automatic timestamps."""

    def __init__(self, path: Optional[Path]):
        self.path = Path(path) if path else None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def write(self, record: Dict[str, Any]) -> None:
        if not self.path:
            return
        record = {"ts": time.time(), **record}
        with self.path.open("a") as f:
            f.write(json.dumps(record, default=_jsonable) + "\n")


def _jsonable(x):
    try:
        import numpy as np

        if isinstance(x, np.ndarray):
            return x.tolist()
        if isinstance(x, (np.integer, np.floating)):
            return x.item()
    except ImportError:  # pragma: no cover
        pass
    return str(x)


def wandb_log_adapter(project: str = "probing-rag-tpu", **init_kwargs):
    """Optional wandb hook for the prober training loop (SURVEY.md §5.5: the
    reference logs losses/lr/dev-acc to wandb, train.py:24-28, 285-289).
    Returns a ``log(record)`` callable, or None when wandb is unavailable."""
    try:  # pragma: no cover - environment-dependent
        import wandb
    except ImportError:
        return None
    run = wandb.init(project=project, **init_kwargs)

    def log(record: Dict[str, Any]) -> None:
        flat = {}
        for key, value in record.items():
            if isinstance(value, list):
                for i, v in enumerate(value):
                    flat[f"{key}/{i}"] = v
            else:
                flat[key] = value
        run.log(flat)

    return log
