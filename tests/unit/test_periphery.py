"""Periphery coverage: env utils, episode logs, training plots, scene
renderer, interactive confirm — the pieces previously verified only by
end-to-end CLI drives (reference counterparts: ballbot_gym/utils/*,
ballbot_rl/visualization/plot_training.py, training/interactive.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from openballbot_rl_tpu.utils.episode_log import save_episode_logs
from openballbot_rl_tpu.utils.helpers import sample_direction_uniform
from openballbot_rl_tpu.utils.logging import CSVLogger


class TestHelpers:
    def test_sample_direction_unit_norm(self):
        d = sample_direction_uniform(jax.random.PRNGKey(0), 64)
        assert d.shape == (64, 2)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1),
                                   1.0, atol=1e-5)

    def test_sample_direction_seeded(self):
        a = sample_direction_uniform(jax.random.PRNGKey(7), 4)
        b = sample_direction_uniform(jax.random.PRNGKey(7), 4)
        c = sample_direction_uniform(jax.random.PRNGKey(8), 4)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c))


class TestEpisodeLogs:
    def test_reference_layout(self, tmp_path):
        """Reference layout: reward .npy + terrain_seeds.txt + depth PNG
        tree (ballbot_gym/utils/logging.py:9-160)."""
        frames = np.random.default_rng(0).random((3, 1, 8, 8)).astype(
            np.float32)
        root = save_episode_logs(str(tmp_path / "log_0"), episode=2,
                                 rewards=np.arange(5, dtype=np.float32),
                                 terrain_seed=1234, depth_frames=frames)
        assert os.path.exists(os.path.join(root, "episode_2_rewards.npy"))
        seeds = open(os.path.join(root, "terrain_seeds.txt")).read()
        assert "2 1234" in seeds
        pngs = os.listdir(os.path.join(root, "rgbd_log_episode_2", "depth"))
        assert sorted(pngs) == ["0.png", "1.png", "2.png"]

    def test_append_seed_history(self, tmp_path):
        root = str(tmp_path / "log_0")
        save_episode_logs(root, 0, np.zeros(1), 10)
        save_episode_logs(root, 1, np.zeros(1), 11)
        lines = open(os.path.join(root, "terrain_seeds.txt")).read().split()
        assert lines == ["0", "10", "1", "11"]


class TestTrainingPlots:
    def test_plot_training_writes_figures(self, tmp_path):
        from openballbot_rl_tpu.viz.plots import plot_training, read_progress

        run = tmp_path / "run"
        os.makedirs(run)
        log = CSVLogger(str(run / "progress.csv"))
        for i in range(1, 6):
            row = {"time/total_timesteps": i * 1000,
                   "rollout/ep_rew_mean": float(i),
                   "rollout/ep_len_mean": 100.0 * i,
                   "train/value_loss": 1.0 / i}
            if i % 2 == 0:
                row["eval/mean_reward"] = float(i) + 0.5
                row["eval/mean_ep_length"] = 50.0 * i
            log.log(row)
        outs = plot_training(str(run))
        assert len(outs) >= 1
        for p in outs:
            assert os.path.getsize(p) > 1000          # non-trivial png
        data = read_progress(str(run / "progress.csv"))
        assert data["time/total_timesteps"][-1] == 5000
        # sparse eval column reads back as NaN on non-eval rows
        assert np.isnan(data["eval/mean_reward"][0])
        assert data["eval/mean_reward"][1] == 2.5


class TestSceneRenderer:
    def test_render_scene_shape_and_content(self):
        from openballbot_rl_tpu.physics import hfield as hf
        from openballbot_rl_tpu.viz.scene import render_scene

        sampler = hf.make_sampler(jnp.zeros((65, 65)), None, 5.0, 1.0)
        frame = np.asarray(render_scene(
            sampler,
            jnp.array([0.0, 0.0, 0.45]), jnp.array([1.0, 0.0, 0.0, 0.0]),
            jnp.array([0.0, 0.0, 0.09]), height=48, width=64))
        assert frame.shape == (48, 64, 3)
        assert frame.min() >= 0.0 and frame.max() <= 1.0
        # sky above the horizon, ground below -> frame is not constant, and
        # the top rows are the sky color family (blue-dominant)
        assert frame.std() > 0.05
        assert (frame[0, :, 2] > frame[0, :, 0]).all()


class TestInteractiveConfirm:
    def test_assume_yes(self):
        from openballbot_rl_tpu.train.interactive import confirm

        assert confirm("overwrite?", assume_yes=True) is True

    def test_non_tty_auto_confirms(self, monkeypatch):
        import sys

        from openballbot_rl_tpu.train.interactive import confirm

        monkeypatch.setattr(sys.stdin, "isatty", lambda: False)
        assert confirm("proceed?") is True

    def test_tty_parses_answers(self, monkeypatch):
        import sys

        from openballbot_rl_tpu.train import interactive

        monkeypatch.setattr(sys.stdin, "isatty", lambda: True)
        answers = iter(["bogus", "n"])
        monkeypatch.setattr("builtins.input", lambda _: next(answers))
        assert interactive.confirm("sure?") is False
        monkeypatch.setattr("builtins.input", lambda _: "y")
        assert interactive.confirm("sure?") is True
        monkeypatch.setattr("builtins.input", lambda _: "")
        assert interactive.confirm("sure?", default=True) is True
