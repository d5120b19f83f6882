from dsdneo_tpu.symbols import framesync, slicer, timing

__all__ = ["framesync", "slicer", "timing"]
