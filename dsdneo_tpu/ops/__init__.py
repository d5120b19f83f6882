from dsdneo_tpu.ops import pallas_frontend

__all__ = ["pallas_frontend"]
