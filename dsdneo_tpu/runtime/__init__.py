from dsdneo_tpu.runtime import config, log

__all__ = ["config", "log"]
