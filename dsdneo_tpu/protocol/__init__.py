from dsdneo_tpu.protocol.base import (DecodeEvent, DecoderContext, DibitReader,
                                      ProtocolDecoder, registry)

__all__ = ["DecodeEvent", "DecoderContext", "DibitReader", "ProtocolDecoder",
           "registry"]
