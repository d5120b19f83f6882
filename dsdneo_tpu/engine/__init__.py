from dsdneo_tpu.engine.decoder import decode_capture, decode_samples
from dsdneo_tpu.engine.modes import MODES, ModeConfig

__all__ = ["MODES", "ModeConfig", "decode_capture", "decode_samples"]
