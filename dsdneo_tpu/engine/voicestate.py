"""Per-channel voice-carry lifecycle shared by the batched pipelines.

Every batched voice pipeline keeps a device-resident (synthesis,
frame-repeat) carry between blocks so talkers spanning block boundaries
synthesize phase-continuously.  When the trunking layer retargets a
channel row to a new frequency (a grant rewrites its NCO offset between
device steps), that row's carry must be cleared — the reference's
controller thread likewise re-inits the per-slot mbe state on retune
(src/io/radio/rtl_sdr_fm.cpp controller_thread_retune_loop →
dsd_mbe.c per-slot state in the decoder context)."""

from __future__ import annotations


class VoiceCarryMixin:
    """Adds ``reset_voice_state`` to pipelines that stash their
    (synth, repeat) carry in ``self._vstate``."""

    def reset_voice_state(self, channels=None) -> None:
        """Clear the cross-block voice carry — every row when
        ``channels`` is None, else just the given row indices."""
        st = getattr(self, "_vstate", None)
        if channels is None or st is None:
            self._vstate = None
            return
        from dsdneo_tpu.vocoder.device import voice_state_reset
        self._vstate = voice_state_reset(st, channels)
