"""Curriculum schedule logic (train/curriculum.py) — pure host-side, no JAX."""
import math

import pytest

from openballbot_rl_tpu.train.curriculum import CurriculumSchedule


def make(**kw):
    base = dict(param="amplitude", start=0.0, end=0.1)
    base.update(kw)
    return CurriculumSchedule.from_config(base)


class TestLinear:
    def test_ramp_and_plateau(self):
        s = make(anneal_frac=0.5)
        assert s.next_value(0.0, 0.0, 4000, 4000) == 0.0
        assert s.next_value(0.25, 0.0, 4000, 4000) == pytest.approx(0.05)
        assert s.next_value(0.5, 0.0, 4000, 4000) == pytest.approx(0.1)
        # plateaus at `end` after anneal_frac
        assert s.next_value(0.9, 0.0, 4000, 4000) == pytest.approx(0.1)

    def test_ignores_performance(self):
        s = make(anneal_frac=0.5)
        v_good = s.next_value(0.25, 0.0, 4000, 4000)
        v_bad = s.next_value(0.25, 0.0, 10, 4000)
        assert v_good == v_bad


class TestAdaptive:
    def test_promotes_on_survival(self):
        s = make(mode="adaptive", step=0.01)
        assert s.next_value(0.1, 0.02, 3600, 4000) == pytest.approx(0.03)

    def test_holds_below_bar(self):
        s = make(mode="adaptive", step=0.01)
        assert s.next_value(0.1, 0.02, 2000, 4000) == pytest.approx(0.02)

    def test_clamps_at_end(self):
        s = make(mode="adaptive", step=0.05)
        assert s.next_value(0.1, 0.08, 4000, 4000) == pytest.approx(0.1)

    def test_nan_ep_len_holds(self):
        s = make(mode="adaptive", step=0.01)
        assert s.next_value(0.0, 0.02, math.nan, 4000) == pytest.approx(0.02)

    def test_demotes_on_collapse(self):
        s = make(mode="adaptive", step=0.01, demote_ep_len_frac=0.25)
        assert s.next_value(0.1, 0.05, 500, 4000) == pytest.approx(0.04)

    def test_no_demote_by_default(self):
        s = make(mode="adaptive", step=0.01)
        assert s.next_value(0.1, 0.05, 500, 4000) == pytest.approx(0.05)

    def test_demote_floors_at_start(self):
        s = make(mode="adaptive", step=0.05, demote_ep_len_frac=0.25)
        assert s.next_value(0.1, 0.02, 10, 4000) == pytest.approx(0.0)

    def test_default_step_is_tenth_of_range(self):
        s = make(mode="adaptive")
        assert s.next_value(0.1, 0.0, 4000, 4000) == pytest.approx(0.01)

    def test_descending_range_promotes_toward_end(self):
        # smaller = harder knobs (e.g. perlin `scale`): promote moves down
        s = make(start=50.0, end=20.0, mode="adaptive", step=3.0)
        assert s.next_value(0.1, 50.0, 4000, 4000) == pytest.approx(47.0)
        assert s.next_value(0.1, 21.0, 4000, 4000) == pytest.approx(20.0)

    def test_descending_range_demotes_toward_start(self):
        s = make(start=50.0, end=20.0, mode="adaptive", step=3.0,
                 demote_ep_len_frac=0.25)
        assert s.next_value(0.1, 30.0, 100, 4000) == pytest.approx(33.0)
        assert s.next_value(0.1, 49.0, 100, 4000) == pytest.approx(50.0)

    def test_decide_every_config_key(self):
        s = make(mode="adaptive", decide_every=16)
        assert s.decide_every == 16


class TestConfig:
    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError, match="unknown curriculum key"):
            make(promote_frac=0.9)  # misspelling of promote_ep_len_frac

    def test_unknown_mode_rejected(self):
        s = make(mode="exponential")
        with pytest.raises(ValueError, match="unknown curriculum mode"):
            s.next_value(0.1, 0.0, 4000, 4000)
