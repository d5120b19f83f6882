from dsdneo_tpu.io.iq import IqMetadata, read_iq_capture, write_iq_capture

__all__ = ["IqMetadata", "read_iq_capture", "write_iq_capture"]
