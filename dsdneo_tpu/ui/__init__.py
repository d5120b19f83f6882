from dsdneo_tpu.ui import terminal

__all__ = ["terminal"]
