from parallel_ddp_tpu.models.kuka.model import kuka, KukaParams, kuka_params

__all__ = ["kuka", "KukaParams", "kuka_params"]
