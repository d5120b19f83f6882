from dsdneo_tpu.protocol.x2tdma import decoder

__all__ = ["decoder"]
