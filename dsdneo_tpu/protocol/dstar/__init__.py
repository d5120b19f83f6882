from dsdneo_tpu.protocol.dstar import decoder

__all__ = ["decoder"]
