from dsdneo_tpu.protocol.ysf import decoder

__all__ = ["decoder"]
