from openballbot_rl_tpu.physics.model import BallbotModel, make_model
from openballbot_rl_tpu.physics.engine import ContactParams, PhysState, init_state, step, forward

__all__ = ["BallbotModel", "make_model", "ContactParams", "PhysState",
           "init_state", "step", "forward"]
