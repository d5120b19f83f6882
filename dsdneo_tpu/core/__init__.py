from dsdneo_tpu.core import events, talkgroup

__all__ = ["events", "talkgroup"]
