"""Streaming decode: blockwise I/Q push with carry across blocks.

The live analog of the reference's demod-thread loop (src/io/radio/
rtl_sdr_fm.cpp demod_thread_fn consuming the input ring blockwise,
with filter/timing state carried in demod_state).  Here the carry is
an overlap window of raw samples: each push demodulates
``[tail | new block]`` and dispatches only frames not already
dispatched from a previous window.

Dispatch discipline (deterministic, reference carry analog
rtl_sdr_fm.cpp:3484-3488):

- **dedup ledger**: every dispatched frame is recorded as
  (sync name, global symbol position); a hit is a duplicate iff the
  same sync name was dispatched within ±2 symbol periods of its global
  position (re-demodulating a longer window can shift the recovered
  symbol grid by a symbol).
- **holdback by frame extent**: a hit waits for the next push when its
  protocol's maximum frame extent crosses the end of the current
  window, so partially received frames are never parsed early.

The overlap must cover the longest protocol frame extent (a DMR voice
superframe read-ahead ≈ 0.32 s) plus filter warm-up; 0.45 s is used.
"""

from __future__ import annotations

import numpy as np

from dsdneo_tpu.engine.demod import demod_fm
from dsdneo_tpu.engine.modes import MODES, ModeConfig
from dsdneo_tpu.protocol import base as proto_base
import dsdneo_tpu.engine.decoder  # noqa: F401  (registers protocol decoders)
from dsdneo_tpu.symbols import framesync

# maximum frame extent in dibits past the sync start, per protocol —
# how much stream a decoder may consume for one frame (P25 LDU: 24 sync
# + 32 NID + 784 data + status ≈ 870; others far less)
_FRAME_EXTENT = {
    "p25p1": 900,
    "p25p2": 400,
    # a DMR voice superframe is read ahead from the VC1 sync:
    # 5 × 288-dibit bursts + the trailing half payload ≈ 1520
    "dmr": 1550,
    "nxdn48": 200, "nxdn96": 200,
    "dpmr": 220,
    "dstar": 250,
    "ysf": 250,
    "m17": 200,
    "edacs": 150,
    "provoice": 150,
    "x2tdma": 200,
}
_DEFAULT_EXTENT = 900


class StreamDecoder:
    """Push-driven single-channel decoder with cross-block carry."""

    def __init__(self, mode: ModeConfig | str, fs: float = 48000.0,
                 sync_threshold: float = 0.62, overlap_s: float = 0.45,
                 ctx: proto_base.DecoderContext | None = None,
                 input_kind: str = "iq"):
        self.mode = MODES[mode] if isinstance(mode, str) else mode
        self.fs = fs
        self.sync_threshold = sync_threshold
        self.overlap = int(fs * overlap_s)
        self.ctx = ctx or proto_base.DecoderContext()
        # "iq" = complex baseband; "disc" = demodulated discriminator
        # PCM (UDP/TCP sources) — timing+slicing only, no front end
        self.input_kind = input_kind
        self._dtype = np.complex64 if input_kind == "iq" else np.float32
        self._tail = np.zeros(0, dtype=self._dtype)
        self._total = 0                 # global sample count pushed
        self._decoders: dict[str, proto_base.ProtocolDecoder] = {}
        self._defs = framesync.patterns_for(set(self.mode.protocols))
        self._sps = fs / self.mode.symbol_rate
        self.last_snr_db: float = 0.0   # bias-corrected eye/EVM SNR
        # dedup ledger: sync name -> sorted-ish list of global symbol
        # positions already dispatched (pruned as the stream advances)
        self._dispatched: dict[str, list[float]] = {}

    # -- dedup ledger -------------------------------------------------------
    def _is_dup(self, name: str, gsym: float) -> bool:
        for p in self._dispatched.get(name, ()):
            if abs(p - gsym) <= 2.0:
                return True
        return False

    def _record(self, name: str, gsym: float) -> None:
        self._dispatched.setdefault(name, []).append(gsym)

    def _prune(self, min_gsym: float) -> None:
        for name, lst in self._dispatched.items():
            self._dispatched[name] = [p for p in lst if p >= min_gsym]

    # -- window processing ----------------------------------------------
    def _process(self, window: np.ndarray, base: int, final: bool) -> None:
        if self.input_kind == "disc":
            from dsdneo_tpu.engine.demod import demod_disc
            dibits, norm = demod_disc(window, self.mode, self.fs)
        else:
            dibits, norm = demod_fm(window, self.mode, self.fs)
        self.last_snr_db = self._eye_snr_db(norm)
        hits = framesync.find_syncs(norm, self._defs,
                                    threshold=self.sync_threshold)
        registry = proto_base.registry()
        consumed_local = 0
        for hit in hits:
            gsym = (base / self._sps) + hit.pos   # global symbol position
            if hit.pos < consumed_local:
                continue
            extent = _FRAME_EXTENT.get(hit.sync.protocol, _DEFAULT_EXTENT)
            if not final and hit.pos + extent > len(dibits):
                break                    # frame may be cut: wait for data
            if self._is_dup(hit.sync.name, gsym):
                continue
            factory = registry.get(hit.sync.protocol)
            if factory is None:
                continue
            dec = self._decoders.setdefault(hit.sync.protocol, factory())
            reader = proto_base.DibitReader(
                dibits, norm, pos=hit.end, frame_start=hit.pos,
                invert=hit.sync.inverted)
            consumed_local = dec.handle(reader, hit, self.ctx)
            self._record(hit.sync.name, gsym)
        self._prune((base - 2 * self.overlap) / self._sps)

    def _eye_snr_db(self, norm: np.ndarray) -> float:
        """Bias-corrected symbol SNR (reference snr_estimator.cpp eye
        method + snr_bias.cpp bandwidth/estimator correction)."""
        from dsdneo_tpu.dsp.measure import snr_bias_db
        if norm.size < 64:
            return self.last_snr_db
        lv = np.array([1.0, 3.0, -1.0, -3.0]) if self.mode.four_level \
            else np.array([1.0, -1.0])
        d = np.min(np.abs(norm[:, None] - lv[None, :]), axis=1)
        noise = float(np.mean(d ** 2))
        sig = float(np.mean(norm ** 2))
        raw = 10.0 * np.log10(max(sig, 1e-9) / max(noise, 1e-9))
        kind = "c4fm" if self.mode.four_level else "evm"
        return raw - snr_bias_db(kind, float(self.mode.symbol_rate),
                                 self.mode.lpf_profile)

    def push(self, block: np.ndarray) -> list:
        """Feed new complex samples; returns events emitted this push."""
        block = np.asarray(block, dtype=self._dtype)
        window = np.concatenate([self._tail, block])
        base = self._total - len(self._tail)
        self._total += len(block)
        self._tail = window[-self.overlap:] if len(window) > self.overlap \
            else window
        # need at least one 256-symbol timing-estimation window + margin
        if len(window) < int(max(self.fs * 0.05, 272 * self._sps)):
            return []
        n_before = len(self.ctx.events)
        self._process(window, base, final=False)
        return self.ctx.events[n_before:]

    def flush(self) -> list:
        """Dispatch anything still held back (end of stream)."""
        n_before = len(self.ctx.events)
        if len(self._tail):
            saved, self._tail = self._tail, np.zeros(0, self._dtype)
            self._process(saved, self._total - len(saved), final=True)
        return self.ctx.events[n_before:]
