"""Training metrics logging (tensorboard via tensorboardX, with fallback)."""

from __future__ import annotations

import json
import os
from typing import Dict


class MetricsWriter:
    """Tensorboard writer when available; always mirrors to JSONL."""

    def __init__(self, log_dir: str, name: str = "SAiD"):
        self.log_dir = os.path.join(log_dir, name)
        os.makedirs(self.log_dir, exist_ok=True)
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(self.log_dir)
        except Exception:
            pass
        self._jsonl = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")

    def log(self, metrics: Dict[str, float], step: int) -> None:
        clean = {k: float(v) for k, v in metrics.items() if v is not None}
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)
        self._jsonl.write(json.dumps({"step": step, **clean}) + "\n")
        self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
