"""Offline/streamed decode driver: capture → events.

The host orchestration loop (the rebuild's liveScanner main loop,
reference src/engine/engine.c:2406-2439): run the device demod step,
hunt frame sync in the recovered symbol stream, dispatch each hit to the
protocol decoder, collect emitted events.
"""

from __future__ import annotations

import dataclasses

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
                   call_recorder=None, keyring=None,
                   mbe_sink=None, m17_udp=None,
                   state_attrs: dict | None = None) -> proto_base.DecoderContext:
    """Decode one channel of complex baseband samples end to end.

    ``p2_params`` optionally seeds (WACN, SYSID, NAC) for the P25p2
    descrambler (the reference's -X flag)."""
    if isinstance(mode, str):
        mode = MODES[mode]
    if mode.name == "auto":
        mode = detect_mode(samples, fs, sync_threshold)
    if cqpsk:
        from dsdneo_tpu.engine.demod import demod_cqpsk_path
        dibits, norm = demod_cqpsk_path(samples, mode, fs)
    else:
        dibits, norm = demod_fm(samples, mode, fs)
    defs = framesync.patterns_for(set(mode.protocols))
    hits = framesync.find_syncs(norm, defs, threshold=sync_threshold)

    ctx = proto_base.DecoderContext(verbose=verbose)
    ctx.call_recorder = call_recorder
    ctx.state.keyring = keyring
    ctx.mbe_sink = mbe_sink
    ctx.m17_udp = m17_udp
    for k, v in (state_attrs or {}).items():
        setattr(ctx.state, k, v)
    if p2_params is not None:
        ctx.state.p2_wacn, ctx.state.p2_sysid, ctx.state.p2_cc = p2_params
    ctx.mode_name = mode.name
    ctx.debug_soft = norm
    ctx.dibits = dibits          # -c symbol capture source
    ctx.debug_iq = samples[:16384]
    ctx.n_syncs = len(hits)
    ctx.sync_scores = [h.score for h in hits]
    registry = proto_base.registry()
    decoders: dict[str, proto_base.ProtocolDecoder] = {}
    consumed_until = 0
    force_pol = getattr(ctx.state, "force_polarity", None)
    for hit in hits:
        if hit.pos < consumed_until:
            continue
        if force_pol:
            # -x inversion expectations (reference opts->inverted_*):
            # drop sync hypotheses at the unexpected polarity.  DMR's
            # inverted syncs are dibit complements of the opposite
            # burst type's normal syncs, so on an inverted channel a
            # voice burst correlates as "+DMR BS data" (argmax ties
            # prefer the + def) — under the inverted expectation the
            # hit is REINTERPRETED as its same-pattern inverted twin
            # instead of dropped (reference inverted_dmr semantics).
            want = force_pol.get(hit.sync.protocol)
            if want is not None and bool(hit.sync.inverted) != want:
                twin = framesync.polarity_twin(hit.sync) if want else None
                if twin is None:
                    continue
                hit = dataclasses.replace(hit, sync=twin)
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


def detect_mode(samples: np.ndarray, fs: float = 48000.0,
                sync_threshold: float = 0.62) -> ModeConfig:
    """Auto mode: run each demod configuration (symbol rate, slicing,
    channel filter) over a probe slice and keep the one whose own
    protocols' sync patterns correlate best — the rebuild of the
    reference's modulation auto-switch hunt (src/dsp/dsd_frame_sync.c
    getFrameSync with opts->mod_* auto)."""
    # probe the middle of the capture (lead-ins are often dead air)
    half = len(samples) // 2
    w = int(fs * 2.0)
    probe = samples[max(half - w, 0):half + w]
    best, best_score = MODES["p25p1"], -1e9
    for name, cfg in MODES.items():
        if name in ("auto", "provoice", "x2tdma"):
            continue          # duplicate configs of other rows
        try:
            ctx = decode_samples(probe, cfg, fs=fs,
                                 sync_threshold=sync_threshold)
        except Exception:
            continue
        # score on structured decode evidence, not display strings:
        # events that carry parsed payload fields got there through
        # FEC/CRC validation (NID BCH, slot-type Golay, CRC-gated
        # headers), while noise-tripped syncs emit bare lines or only
        # bookkeeping keys.  Error lines count against (failed FEC on a
        # wrong-rate slicer is the common false-sync signature).
        bookkeeping = {"slot", "voice", "imbe", "ambe216"}
        score = 0.0
        for e in ctx.events:
            is_err = "ERR" in e.line or "FAIL" in e.line
            if is_err:
                score -= 0.25
                continue
            nfields = sum(1 for k, v in e.fields.items()
                          if k not in bookkeeping
                          and not isinstance(v, np.ndarray))
            score += min(nfields, 3)
        if score > best_score:
            best, best_score = cfg, score
    return best


def decode_capture(path: str, mode: ModeConfig | str, **kw
                   ) -> proto_base.DecoderContext:
    """Decode an on-disk I/Q capture (``.iq`` / ``.iq.json``).

    DSD_NEO_RESAMP (reference docs/cli.md:537 — default 48000, ``off``
    keeps the capture's native rate): captures at any rate are run
    through the polyphase resampler to the target DSP rate first, so
    one compiled front-end graph serves every input rate."""
    meta, samples = read_iq_capture(path)
    fs = float(meta.sample_rate_hz)
    from dsdneo_tpu.runtime import config as rtcfg
    target = rtcfg.get().resamp_hz
    if target > 0 and float(target) != fs:
        import jax.numpy as jnp

        from dsdneo_tpu.dsp.resampler import resample
        samples = np.asarray(resample(jnp.asarray(samples),
                                      int(round(fs)), int(target)))
        fs = float(target)
    return decode_samples(samples, mode, fs=fs, **kw)
