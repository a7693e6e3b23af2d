from parallel_ddp_tpu.runtime.pubsub import PubSub, Channels
from parallel_ddp_tpu.runtime import messages

__all__ = ["PubSub", "Channels", "messages"]
