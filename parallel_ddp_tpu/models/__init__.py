from parallel_ddp_tpu.models.base import Plant
from parallel_ddp_tpu.models.pendulum import pendulum
from parallel_ddp_tpu.models.cartpole import cartpole
from parallel_ddp_tpu.models.quadrotor import quadrotor
from parallel_ddp_tpu.models.urdf import load_urdf, urdf_plant

__all__ = ["Plant", "pendulum", "cartpole", "quadrotor", "load_urdf",
           "urdf_plant"]
