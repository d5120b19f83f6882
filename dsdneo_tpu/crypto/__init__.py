from dsdneo_tpu.crypto import keystream

__all__ = ["keystream"]
