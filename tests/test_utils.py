import json
import os

import numpy as np

from onebit_tpu.utils.logging import TrainerLog, plot_loss
from onebit_tpu.utils.profiling import ThroughputMeter


def test_trainer_log_fields(tmp_path):
    tlog = TrainerLog(str(tmp_path), total_steps=10)
    entry = tlog.log(2, {"loss": 1.5, "learning_rate": 1e-4,
                         "kd_loss": 0.3}, epoch=0.2)
    assert entry["current_steps"] == 2
    assert entry["percentage"] == 20.0
    assert "remaining_time" in entry and "elapsed_time" in entry
    lines = open(os.path.join(tmp_path, "trainer_log.jsonl")).readlines()
    row = json.loads(lines[0])
    assert row["loss"] == 1.5 and row["kd_loss"] == 0.3


def test_plot_loss(tmp_path):
    tlog = TrainerLog(str(tmp_path), total_steps=5)
    for i in range(5):
        tlog.log(i + 1, {"loss": 2.0 - 0.1 * i, "learning_rate": 1e-4})
    written = plot_loss(str(tmp_path), keys=["loss", "missing_key"])
    assert len(written) == 1 and written[0].endswith("training_loss.png")
    assert os.path.getsize(written[0]) > 0


def test_throughput_meter():
    m = ThroughputMeter()
    assert m.tick(10) == 0.0   # first tick has no interval
    rate = m.tick(10)
    assert rate > 0
