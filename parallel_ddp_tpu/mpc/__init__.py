from parallel_ddp_tpu.mpc.driver import MPCConfig, MPCController, MPCState
from parallel_ddp_tpu.mpc.controls import get_hardware_controls

__all__ = ["MPCConfig", "MPCController", "MPCState", "get_hardware_controls"]
