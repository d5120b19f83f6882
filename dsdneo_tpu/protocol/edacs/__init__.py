from dsdneo_tpu.protocol.edacs import decoder

__all__ = ["decoder"]
