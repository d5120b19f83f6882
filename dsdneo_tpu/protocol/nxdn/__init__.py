from dsdneo_tpu.protocol.nxdn import decoder

__all__ = ["decoder"]
