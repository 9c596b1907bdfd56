"""Metric accumulators, JSONL logger, and the StepTimer."""

import json
import time

from multimodalsimilar_tpu.train.metrics import MeanAccumulator, MetricLogger
from multimodalsimilar_tpu.utils.profiling import StepTimer


def test_mean_accumulator_weighted_reset():
    acc = MeanAccumulator()
    acc.update(1.0, weight=3)
    acc.update(0.0, weight=1)
    assert acc.compute() == 0.75
    acc.reset()
    assert acc.compute() == 0.0   # empty -> 0, no div-by-zero


def test_metric_logger_jsonl(tmp_path, capsys):
    path = str(tmp_path / "m.jsonl")
    logger = MetricLogger(path)
    logger.log(10, {"loss": 1.5, "acc": 0.25}, prefix="train/")
    logger.log(20, {"acc": 0.5}, prefix="eval/")
    logger.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0] == {"step": 10, "train/loss": 1.5, "train/acc": 0.25}
    assert lines[1] == {"step": 20, "eval/acc": 0.5}
    out = capsys.readouterr().out
    assert "[step 10]" in out and "train/loss=1.5" in out


def test_step_timer_skips_warmup():
    t = StepTimer(skip_first=2)
    for delay in (0.05, 0.05, 0.01, 0.01, 0.01):  # first 2 = "compile"
        t.tick()
        time.sleep(delay)
    t.tick()
    s = t.summary(batch_size=10)
    assert s["steps"] == 3
    assert s["mean_ms"] < 40  # the two 50 ms warmups were skipped
    assert s["examples_per_sec"] > 100
