from dsdneo_tpu.fec import blockcodes, gf, rs

__all__ = ["blockcodes", "gf", "rs"]
