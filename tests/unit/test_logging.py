"""Resume-aware training loggers (utils/logging.py).

The reference loses eval history on resume (SB3 EvalCallback starts a fresh
evaluations.npz; SURVEY.md §5.4). Ours reloads and truncates to the resumed
checkpoint's step so a resumed run continues the same progress.csv /
evaluations.npz series.
"""
import csv
import os

import numpy as np

from openballbot_rl_tpu.utils.logging import CSVLogger, EvalLog


def test_csvlogger_reloads_and_truncates(tmp_path):
    path = os.path.join(tmp_path, "progress.csv")
    a = CSVLogger(path)
    a.log({"time/total_timesteps": 100, "x": 1.0})
    a.log({"time/total_timesteps": 200, "x": 2.0, "y": 5.0})
    a.log({"time/total_timesteps": 300, "x": 3.0})

    b = CSVLogger(path)
    assert len(b.rows) == 3
    assert "y" in b.fields
    b.truncate(200)
    b.log({"time/total_timesteps": 250, "x": 9.0})
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    assert [float(r["time/total_timesteps"]) for r in rows] == [100, 200, 250]
    # sparse column survives the round-trip without fabricating values
    assert rows[0]["y"] == "" and rows[1]["y"] == "5.0"


def test_csvlogger_fresh_run_discards(tmp_path):
    path = os.path.join(tmp_path, "progress.csv")
    a = CSVLogger(path)
    a.log({"time/total_timesteps": 100, "x": 1.0})
    b = CSVLogger(path)
    b.truncate(-1)  # what cli/train.py does on a confirmed overwrite
    b.log({"time/total_timesteps": 50, "x": 0.5})
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    assert [float(r["time/total_timesteps"]) for r in rows] == [50]


def test_evallog_reloads_truncates_and_seeds_best(tmp_path):
    a = EvalLog(str(tmp_path))
    a.add(100, np.array([1.0, 3.0]), np.array([10, 20]))
    a.add(200, np.array([5.0, 7.0]), np.array([30, 40]))
    a.add(300, np.array([2.0, 2.0]), np.array([50, 60]))

    b = EvalLog(str(tmp_path))
    assert b.timesteps == [100, 200, 300]
    assert b.best_mean() == 6.0
    b.truncate(200)
    assert b.timesteps == [100, 200]
    assert b.best_mean() == 6.0  # best at 200 survives
    b.add(250, np.array([4.0, 4.0]), np.array([70, 80]))
    d = np.load(os.path.join(tmp_path, "evaluations.npz"))
    assert list(d["timesteps"]) == [100, 200, 250]
    assert d["results"].shape == (3, 2)


def test_evallog_empty_best_is_minus_inf(tmp_path):
    assert EvalLog(str(tmp_path)).best_mean() == -np.inf
