"""Offline/streamed decode driver: capture → events.

The host orchestration loop (the rebuild's liveScanner main loop,
reference src/engine/engine.c:2406-2439): run the device demod step,
hunt frame sync in the recovered symbol stream, dispatch each hit to the
protocol decoder, collect emitted events.
"""

from __future__ import annotations

import numpy as np

from dsdneo_tpu.engine.demod import demod_fm
from dsdneo_tpu.engine.modes import MODES, ModeConfig
from dsdneo_tpu.io import read_iq_capture
from dsdneo_tpu.protocol import base as proto_base
# importing protocol packages registers their decoders
import dsdneo_tpu.protocol.dmr  # noqa: F401
import dsdneo_tpu.protocol.dpmr  # noqa: F401
import dsdneo_tpu.protocol.edacs  # noqa: F401
import dsdneo_tpu.protocol.m17  # noqa: F401
import dsdneo_tpu.protocol.dstar  # noqa: F401
import dsdneo_tpu.protocol.nxdn  # noqa: F401
import dsdneo_tpu.protocol.ysf  # noqa: F401
import dsdneo_tpu.protocol.p25  # noqa: F401
import dsdneo_tpu.protocol.provoice  # noqa: F401
import dsdneo_tpu.protocol.x2tdma  # noqa: F401
from dsdneo_tpu.symbols import framesync


def decode_samples(samples: np.ndarray, mode: ModeConfig | str,
                   fs: float = 48000.0, sync_threshold: float = 0.62,
                   verbose: int = 0, cqpsk: bool = False,
                   p2_params: tuple[int, int, int] | None = None,
                   call_recorder=None) -> proto_base.DecoderContext:
    """Decode one channel of complex baseband samples end to end.

    ``p2_params`` optionally seeds (WACN, SYSID, NAC) for the P25p2
    descrambler (the reference's -X flag)."""
    if isinstance(mode, str):
        mode = MODES[mode]
    if cqpsk:
        from dsdneo_tpu.engine.demod import demod_cqpsk_path
        dibits, norm = demod_cqpsk_path(samples, mode, fs)
    else:
        dibits, norm = demod_fm(samples, mode, fs)
    defs = framesync.patterns_for(set(mode.protocols))
    hits = framesync.find_syncs(norm, defs, threshold=sync_threshold)

    ctx = proto_base.DecoderContext(verbose=verbose)
    ctx.call_recorder = call_recorder
    if p2_params is not None:
        ctx.state.p2_wacn, ctx.state.p2_sysid, ctx.state.p2_cc = p2_params
    ctx.mode_name = mode.name
    ctx.debug_soft = norm
    ctx.debug_iq = samples[:16384]
    ctx.n_syncs = len(hits)
    registry = proto_base.registry()
    decoders: dict[str, proto_base.ProtocolDecoder] = {}
    consumed_until = 0
    for hit in hits:
        if hit.pos < consumed_until:
            continue
        factory = registry.get(hit.sync.protocol)
        if factory is None:
            ctx.emit(f"Sync: {hit.sync.name} (no decoder)", hit.sync.protocol,
                     hit.pos)
            continue
        dec = decoders.setdefault(hit.sync.protocol, factory())
        reader = proto_base.DibitReader(
            dibits, norm, pos=hit.end, frame_start=hit.pos,
            invert=hit.sync.inverted)
        consumed_until = dec.handle(reader, hit, ctx)
    return ctx


def decode_capture(path: str, mode: ModeConfig | str, **kw
                   ) -> proto_base.DecoderContext:
    """Decode an on-disk I/Q capture (``.iq`` / ``.iq.json``)."""
    meta, samples = read_iq_capture(path)
    return decode_samples(samples, mode, fs=float(meta.sample_rate_hz), **kw)
