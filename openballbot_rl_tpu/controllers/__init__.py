from openballbot_rl_tpu.controllers.pid import (
    PIDParams, PIDState, pid_act, pid_init, reference_gains)

__all__ = ["PIDParams", "PIDState", "pid_act", "pid_init", "reference_gains"]
