from dsdneo_tpu.vocoder import mbe, synth

__all__ = ["mbe", "synth"]
