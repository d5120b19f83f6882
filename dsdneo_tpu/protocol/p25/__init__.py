from dsdneo_tpu.protocol.p25 import phase1, phase2

__all__ = ["phase1", "phase2"]
