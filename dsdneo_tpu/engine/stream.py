"""Streaming decode: blockwise I/Q push with carry across blocks.

The live analog of the reference's demod-thread loop (src/io/radio/
rtl_sdr_fm.cpp demod_thread_fn consuming the input ring blockwise,
with filter/timing state carried in demod_state).  Here the carry is
an overlap window of raw samples: each push demodulates
``[tail | new block]`` and dispatches only frames whose global sample
position is beyond the last dispatched frame, so frames spanning a
block boundary decode from the next window and duplicates from the
overlap are suppressed.

The overlap must cover the longest protocol frame (a P25 LDU ≈ 0.19 s)
plus filter warm-up; 0.3 s of samples is used.
"""

from __future__ import annotations

import numpy as np

from dsdneo_tpu.engine.demod import demod_fm
from dsdneo_tpu.engine.modes import MODES, ModeConfig
from dsdneo_tpu.protocol import base as proto_base
import dsdneo_tpu.engine.decoder  # noqa: F401  (registers protocol decoders)
from dsdneo_tpu.symbols import framesync


class StreamDecoder:
    """Push-driven single-channel decoder with cross-block carry."""

    def __init__(self, mode: ModeConfig | str, fs: float = 48000.0,
                 sync_threshold: float = 0.62, overlap_s: float = 0.3,
                 ctx: proto_base.DecoderContext | None = None):
        self.mode = MODES[mode] if isinstance(mode, str) else mode
        self.fs = fs
        self.sync_threshold = sync_threshold
        self.overlap = int(fs * overlap_s)
        self.ctx = ctx or proto_base.DecoderContext()
        self._tail = np.zeros(0, dtype=np.complex64)
        self._total = 0                 # global sample count pushed
        self._last_global = -1.0        # sample position of last dispatch
        self._decoders: dict[str, proto_base.ProtocolDecoder] = {}
        self._defs = framesync.patterns_for(set(self.mode.protocols))
        self._sps = fs / self.mode.symbol_rate

    def push(self, block: np.ndarray) -> list:
        """Feed new complex samples; returns events emitted this push."""
        block = np.asarray(block, dtype=np.complex64)
        window = np.concatenate([self._tail, block])
        base = self._total - len(self._tail)
        self._total += len(block)
        self._tail = window[-self.overlap:] if len(window) > self.overlap \
            else window
        if len(window) < int(self.fs * 0.05):
            return []

        n_before = len(self.ctx.events)
        dibits, norm = demod_fm(window, self.mode, self.fs)
        hits = framesync.find_syncs(norm, self._defs,
                                    threshold=self.sync_threshold)
        registry = proto_base.registry()
        # holdback: frames too close to the window's end wait for the
        # next push (they may be cut); approximated by the overlap size
        holdback_sym = (self.overlap * 0.9) / self._sps
        limit = len(dibits) - holdback_sym if len(block) > 0 else len(dibits)
        consumed_local = 0
        for hit in hits:
            g = base + hit.pos * self._sps
            if g <= self._last_global + 4 * self._sps:
                continue                 # already dispatched (overlap dup)
            if hit.pos < consumed_local:
                continue
            if hit.pos > limit:
                break                    # wait for more samples
            factory = registry.get(hit.sync.protocol)
            if factory is None:
                continue
            dec = self._decoders.setdefault(hit.sync.protocol, factory())
            reader = proto_base.DibitReader(
                dibits, norm, pos=hit.end, frame_start=hit.pos,
                invert=hit.sync.inverted)
            consumed_local = dec.handle(reader, hit, self.ctx)
            self._last_global = g
        return self.ctx.events[n_before:]

    def flush(self) -> list:
        """Dispatch anything still held back (end of stream)."""
        n_before = len(self.ctx.events)
        if len(self._tail):
            saved, self._tail = self._tail, np.zeros(0, np.complex64)
            window = saved
            base = self._total - len(saved)
            dibits, norm = demod_fm(window, self.mode, self.fs)
            hits = framesync.find_syncs(norm, self._defs,
                                        threshold=self.sync_threshold)
            registry = proto_base.registry()
            consumed_local = 0
            for hit in hits:
                g = base + hit.pos * self._sps
                if g <= self._last_global + 4 * self._sps:
                    continue
                if hit.pos < consumed_local:
                    continue
                factory = registry.get(hit.sync.protocol)
                if factory is None:
                    continue
                dec = self._decoders.setdefault(hit.sync.protocol, factory())
                reader = proto_base.DibitReader(
                    dibits, norm, pos=hit.end, frame_start=hit.pos,
                    invert=hit.sync.inverted)
                consumed_local = dec.handle(reader, hit, self.ctx)
                self._last_global = g
        return self.ctx.events[n_before:]
