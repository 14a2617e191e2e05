# Developer entry points (reference: Makefile:14-48)

PY ?= python

.PHONY: test test-fast lint format train eval pid-check goldens bench install

install:
	pip install -e . --no-deps --no-build-isolation

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/unit -q -x

lint:
	$(PY) -m ruff check openballbot_rl_tpu tests || true

format:
	$(PY) -m ruff format openballbot_rl_tpu tests || \
	$(PY) -m black openballbot_rl_tpu tests

train:
	ballbot-train --config configs/train/ppo_directional.yaml

eval:
	ballbot-eval --model $(MODEL)

pid-check:
	$(PY) scripts/test_pid.py --steps 25000

goldens:
	$(PY) tools/make_goldens.py

bench:
	$(PY) bench.py
