from parallel_ddp_tpu.ops.integrators import make_step, make_step_jacobian

__all__ = ["make_step", "make_step_jacobian"]
