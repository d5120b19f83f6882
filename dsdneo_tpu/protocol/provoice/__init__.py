from dsdneo_tpu.protocol.provoice import decoder

__all__ = ["decoder"]
