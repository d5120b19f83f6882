from dsdneo_tpu.dsp import firdes, frontend

__all__ = ["firdes", "frontend"]
