"""Pallas TPU kernels for ops where XLA fusion is insufficient."""
from openballbot_rl_tpu.ops.tent_sample import (
    tent_sample, tent_sample_batched, tent_sample_ref)

__all__ = ["tent_sample", "tent_sample_batched", "tent_sample_ref"]
