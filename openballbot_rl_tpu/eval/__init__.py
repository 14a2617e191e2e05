"""Model evaluation (reference: ballbot_rl/evaluation/)."""
from openballbot_rl_tpu.eval.evaluate import evaluate_policy

__all__ = ["evaluate_policy"]
