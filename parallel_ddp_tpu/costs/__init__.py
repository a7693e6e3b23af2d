from parallel_ddp_tpu.costs.base import CostModel
from parallel_ddp_tpu.costs.joint import joint_cost, fixed_diag_cost
from parallel_ddp_tpu.costs.ee import ee_cost

__all__ = ["CostModel", "joint_cost", "fixed_diag_cost", "ee_cost"]
