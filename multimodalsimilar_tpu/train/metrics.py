"""Metric accumulators (host-side, fed by per-step device scalars).

The reference uses torchmetrics.Accuracy — accumulated over the *entire run*
without reset (a known wart, SURVEY.md §8) — and micro-F1 for CV validation
(cv_classifier_train_daodian.py:173). For single-label multiclass, micro-F1
equals accuracy (TP = correct, FP = FN = incorrect), so one accumulator
covers both; ours resets per eval window.
"""

from __future__ import annotations

from typing import Dict


class MeanAccumulator:
    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, value: float, weight: int = 1):
        self.total += float(value) * weight
        self.count += weight

    def compute(self) -> float:
        return self.total / max(self.count, 1)

    def reset(self):
        self.total, self.count = 0.0, 0


class MetricLogger:
    """JSONL metric stream + stdout — the framework's TensorBoard stand-in
    (runs/ scalars in the reference). One line per logged step."""

    def __init__(self, path=None):
        self.path = path
        self._fh = open(path, "a") if path else None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = ""):
        rec = {"step": step}
        rec.update({(f"{prefix}{k}"): float(v) for k, v in metrics.items()})
        if self._fh:
            import json
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        pretty = " ".join(f"{k}={v:.5g}" for k, v in rec.items()
                          if k != "step")
        print(f"[step {step}] {pretty}", flush=True)

    def close(self):
        if self._fh:
            self._fh.close()
