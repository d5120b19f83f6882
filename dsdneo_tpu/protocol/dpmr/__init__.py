from dsdneo_tpu.protocol.dpmr import decoder

__all__ = ["decoder"]
