"""Live viewer tests: MJPEG server round-trip, ANSI rendering, and a short
headless `ballbot-live` run (the GUI-debugging capability the reference has
through its MuJoCo viewer, ballbot_env.py:347-357)."""
import urllib.request

import numpy as np
import pytest


def test_liveviewer_serves_frames_and_telemetry():
    from openballbot_rl_tpu.viz.live import LiveViewer

    v = LiveViewer(host="127.0.0.1", port=0)
    try:
        frame = np.zeros((32, 48, 3), np.uint8)
        frame[8:24, 16:32] = (255, 128, 0)
        v.push(frame, telemetry="ep 0 ret +1.0")

        with urllib.request.urlopen(
                f"http://127.0.0.1:{v.port}/frame.jpg", timeout=10) as r:
            data = r.read()
        assert data[:2] == b"\xff\xd8", "not a JPEG"

        with urllib.request.urlopen(
                f"http://127.0.0.1:{v.port}/telemetry", timeout=10) as r:
            assert r.read() == b"ep 0 ret +1.0"

        with urllib.request.urlopen(
                f"http://127.0.0.1:{v.port}/", timeout=10) as r:
            assert b"live rollout" in r.read()

        # stream endpoint yields at least one multipart frame
        req = urllib.request.urlopen(
            f"http://127.0.0.1:{v.port}/stream", timeout=10)
        chunk = req.read(64)
        assert b"--frame" in chunk
        req.close()
    finally:
        v.close()


def test_ansi_frame_renders():
    from openballbot_rl_tpu.viz.live import ansi_frame

    frame = np.random.default_rng(0).integers(
        0, 255, (60, 80, 3), dtype=np.uint8)
    art = ansi_frame(frame, width=20)
    lines = art.split("\n")
    assert all("▀" in ln for ln in lines)
    assert "\x1b[38;2;" in art and "\x1b[0m" in art


@pytest.mark.slow
def test_ballbot_live_headless_run():
    """Random policy, flat terrain, tiny frames, bounded wall time; the
    viewer must serve the latest frame while the rollout runs."""
    from openballbot_rl_tpu.cli.live_view import main

    rc = main(config={"problem": {
        "terrain": {"type": "flat", "config": {}},
        "reward": {"type": "directional",
                   "config": {"target_direction": [0.0, 1.0]}}},
        "env": {"max_ep_steps": 64}},
        port=0, fps=60.0, height=48, width=64, episodes=1,
        verbose=False, max_seconds=30.0)
    assert rc == 0


def test_liveviewer_command_channel():
    """Round-4 interactivity: /cmd?k=X queues keys; poll_commands drains
    FIFO (closes the reference's viewer pause/reset capability delta)."""
    import urllib.parse

    from openballbot_rl_tpu.viz.live import LiveViewer

    v = LiveViewer(port=0)
    try:
        for k in (" ", "r", "p"):
            urllib.request.urlopen(
                f"http://127.0.0.1:{v.port}/cmd?k={urllib.parse.quote(k)}",
                timeout=5)
        assert v.poll_commands() == [" ", "r", "p"]
        assert v.poll_commands() == []
    finally:
        v.close()


def test_ballbot_live_commands_drive_loop(monkeypatch):
    """space pauses (sim time freezes), r resets the episode, q quits."""
    import threading
    import time as _time
    import urllib.parse

    from openballbot_rl_tpu.cli.live_view import main
    from openballbot_rl_tpu.viz import live as live_mod

    captured = {}
    orig_init = live_mod.LiveViewer.__init__

    def spy_init(self, *a, **kw):
        orig_init(self, *a, **kw)
        captured["viewer"] = self

    monkeypatch.setattr(live_mod.LiveViewer, "__init__", spy_init)

    def driver():
        while "viewer" not in captured:
            _time.sleep(0.05)
        v = captured["viewer"]
        send = lambda k: urllib.request.urlopen(
            f"http://127.0.0.1:{v.port}/cmd?k={urllib.parse.quote(k)}",
            timeout=5)
        _time.sleep(1.5)
        send(" ")           # pause
        _time.sleep(0.8)
        send(" ")           # resume
        send("p")           # perturb
        _time.sleep(0.5)
        send("r")           # reset episode
        _time.sleep(0.5)
        send("q")           # quit

    t = threading.Thread(target=driver, daemon=True)
    t.start()
    rc = main(config={"problem": {
        "terrain": {"type": "flat", "config": {}},
        "reward": {"type": "directional",
                   "config": {"target_direction": [0.0, 1.0]}}}},
        port=0, fps=20.0, height=48, width=64, episodes=0,
        verbose=False, max_seconds=30.0)
    assert rc == 0
    t.join(timeout=5)
