"""End-to-end trainer drive (cli/train.py) in-process on CPU.

Covers the run-dir contract (config.yaml/info.txt/progress.csv/
evaluations.npz/best_model/final_model) and the ASYNC video-on-best path
(round-2: background worker thread + latest-wins queue, matching the
reference's threaded recorder callbacks.py:94-331 — including the drain at
training end, so the best video exists when main() returns)."""
import csv
import glob
import os

import pytest

pytestmark = [pytest.mark.integration, pytest.mark.slow]


def test_train_main_run_dir_and_async_video(tmp_path):
    from openballbot_rl_tpu.cli.train import main as train_main

    out = str(tmp_path / "run")
    config = {
        "problem": {
            "terrain": {"type": "flat", "config": {}},
            "reward": {"type": "directional",
                       "config": {"target_direction": [0.0, 1.0]}},
        },
        "env": {"max_ep_steps": 48},
        "camera": {"enabled": False},
        "num_envs": 8,
        "terrain_bank_size": 2,
        "total_timesteps": 8 * 8 * 3,
        "algo": {"n_steps": 8, "batch_sz": 16, "n_epochs": 1},
        "evaluation": {"freq": 64, "n_episodes": 2},
        "checkpoint_freq": 10 ** 9,
        "visualization": {"video_on_best": True, "episodes": 1},
    }
    ret = train_main(config, seed=0, out_dir=out, verbose=False,
                     assume_yes=True)
    assert ret == out
    for f in ("config.yaml", "info.txt", "progress.csv"):
        assert os.path.exists(os.path.join(out, f)), f
    assert os.path.exists(os.path.join(out, "results", "evaluations.npz"))
    assert os.path.isdir(os.path.join(out, "final_model"))
    with open(os.path.join(out, "progress.csv"), newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert int(rows[-1]["time/total_timesteps"]) == 192
    # an eval fired at iteration 1 -> new best -> async video; the drain at
    # the end of main() guarantees it finished rendering
    vids = glob.glob(os.path.join(out, "videos", "best_*.*"))
    assert vids, "async video-on-best produced no file"
    assert os.path.getsize(vids[0]) > 0


def test_curriculum_run_config_records_end_value(tmp_path):
    """A curriculum run's archived config.yaml must carry the curriculum
    END value in its terrain config: the source config leaves the annealed
    parameter unset (bank_at injects it per build), and without baking it
    in, ballbot-eval/-visualize/-collect on the checkpoint silently fall
    back to the generator default — amplitude 1.0 for perlin, 4x a
    0.25-curriculum's target (round-5 64-episode re-eval bug)."""
    import yaml

    from openballbot_rl_tpu.cli.train import main as train_main

    out = str(tmp_path / "currun")
    config = {
        "problem": {
            # no amplitude key: exactly the shipped curriculum configs
            "terrain": {"type": "perlin",
                        "config": {"scale": 25.0, "octaves": 1,
                                   "persistence": 0.2, "lacunarity": 2.0,
                                   "seed": None}},
            "reward": {"type": "directional",
                       "config": {"target_direction": [0.0, 1.0]}},
        },
        "env": {"max_ep_steps": 48},
        "camera": {"enabled": False},
        "num_envs": 8,
        "terrain_bank_size": 2,
        "total_timesteps": 8 * 8 * 2,
        "algo": {"n_steps": 8, "batch_sz": 16, "n_epochs": 1},
        "curriculum": {"param": "amplitude", "start": 0.0, "end": 0.25,
                       "anneal_frac": 0.5, "regen_every": 1},
        "evaluation": {"freq": 10 ** 9, "n_episodes": 2},
        "checkpoint_freq": 10 ** 9,
    }
    train_main(config, seed=0, out_dir=out, verbose=False, assume_yes=True)
    with open(os.path.join(out, "config.yaml")) as f:
        dumped = yaml.safe_load(f)
    assert dumped["problem"]["terrain"]["config"]["amplitude"] == 0.25
    # the in-memory config the trainer ran with is NOT mutated (bank_at
    # injects the current value itself; callers may reuse the dict)
    assert "amplitude" not in config["problem"]["terrain"]["config"]
