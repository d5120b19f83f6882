from dsdneo_tpu.protocol.p25 import phase1

__all__ = ["phase1"]
