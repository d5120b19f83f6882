from dsdneo_tpu.protocol.dmr import bs

__all__ = ["bs"]
