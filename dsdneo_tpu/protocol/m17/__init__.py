from dsdneo_tpu.protocol.m17 import decoder

__all__ = ["decoder"]
