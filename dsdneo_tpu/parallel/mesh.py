"""Multi-chip scaling: shard the channel axis over the ICI mesh.

The decode workload is embarrassingly parallel over channels — the
reference's equivalent of "many processes, one channel each"
(SURVEY.md §2.8) — so the natural mesh layout is channels over devices
with NO cross-channel collectives in the hot path.  ``shard_map`` runs
the SAME single-device program on each device's channel shard (the
production pattern), and collectives appear only for fleet-level
metrics (a psum of power counters riding the ICI).

Two sharded steps exist:

- ``make_sharded_frontend``: the demod front end alone (the round-1
  contract, kept for the lightweight dryrun path);
- ``make_sharded_voice_step``: the FULL voice device program — front
  end → sync matched filter → device top-k → BCH NID → LDU frame
  gather → IMBE ECC → dequantization → harmonic synthesis — under the
  mesh.  LDU selection uses fixed-capacity device-side picking (the
  top ``max_ldus`` sync candidates per channel, validity-masked by
  DUID), so the whole chain stays one SPMD program with no host in the
  loop.

``dryrun_multichip`` is the driver contract: build an N-device mesh,
jit both sharded steps, run one step of each on tiny shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dsdneo_tpu.dsp import firdes
from dsdneo_tpu.engine.batched import frontend_step
from dsdneo_tpu.engine.modes import MODES


def make_sharded_frontend(mesh: Mesh, mode_name: str, C: int, B: int,
                          fs: float = 48000.0):
    """Jitted ``[C, B]`` step with channels sharded over mesh axis 'ch'.

    Returns (step_fn, input_sharding).  The step also returns a
    fleet-aggregate mean power (a psum across the mesh — exercising the
    collective path).
    """
    mode = MODES[mode_name]
    sps = fs / mode.symbol_rate
    n_sym = int(B // sps) - 2
    # keep taps as a host constant: eager device ops are slow on the
    # tunneled TPU and complex/constant transfers can be unsupported
    taps = firdes.channel_lpf(fs, mode.lpf_profile)

    in_shard = NamedSharding(mesh, P("ch", None, None))  # [C, B, 2] I/Q planes
    out_shard = (NamedSharding(mesh, P("ch", None)),
                 NamedSharding(mesh, P("ch", None)),
                 NamedSharding(mesh, P("ch")),
                 NamedSharding(mesh, P()))

    @partial(jax.jit, in_shardings=in_shard, out_shardings=out_shard)
    def step(iq):
        dibits, soft, power = frontend_step(iq, taps, sps, n_sym,
                                            mode.four_level)
        fleet_power = jnp.mean(power)   # cross-device mean → all-reduce
        return dibits, soft, power, fleet_power

    return step, in_shard


def make_sharded_voice_step(mesh: Mesh, C: int, B: int,
                            fs: float = 48000.0, max_ldus: int = 2,
                            sync_threshold: float = 0.62,
                            use_pallas: bool = False):
    """The FULL P25p1 voice chain as one SPMD program over the mesh.

    Each device decodes its local channel shard end to end (front end,
    sync correlation, NID, LDU gather, IMBE ECC, dequantization,
    synthesis — the voicebatch/voice_decode_gather chain) and a psum
    aggregates fleet power.  Returns (step_fn, input_sharding); the
    step maps [C, B, 2] I/Q → ([C, max_ldus·9·160] PCM, fleet_power).
    """
    try:
        from jax import shard_map
    except ImportError:                  # older jax
        from jax.experimental.shard_map import shard_map

    from dsdneo_tpu.engine.voicebatch import (LDU_DATA_DIBITS,
                                              LDU_IMBE_OFFSETS,
                                              _status_strip_map,
                                              _sync_kernel,
                                              correlate_syncs_device)
    from dsdneo_tpu.fec import blockcodes
    from dsdneo_tpu.vocoder.device import voice_decode_gather

    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    assert C % n_dev == 0, "channel count must divide the mesh"
    Cl = C // n_dev

    mode = MODES["p25p1"]
    sps = fs / mode.symbol_rate
    n_sym = int(B // sps) - 2
    taps = firdes.channel_lpf(fs, mode.lpf_profile)
    names = ("+P25p1", "-P25p1")
    defs, _, _, n_max_pat = _sync_kernel(names)
    n_pat = len(defs[0].pattern)
    nid_strip = _status_strip_map(n_pat, 32).astype(np.int32)
    strip = _status_strip_map(n_pat, 32 + LDU_DATA_DIBITS)
    frame_offs = np.stack([strip[32 + o:32 + o + 72]
                           for o in LDU_IMBE_OFFSETS]).astype(np.int32)
    need = int(strip[-1]) + 1
    bch_pm = blockcodes.bch_63_16().pm.astype(np.float32)
    K = max_ldus
    n_steps = K * 9
    # static frame index maps for the fixed-capacity LDU layout
    fch_base = np.repeat(np.arange(Cl * K) // K, 9).astype(np.int32)
    forder = np.tile(np.repeat(np.arange(K), 9) * 9
                     + np.tile(np.arange(9), K), Cl).astype(np.int32)

    def local_step(iq):                     # [Cl, B, 2] per device
        dibits, soft, power = frontend_step(iq, taps, sps, n_sym,
                                            mode.four_level,
                                            use_pallas=use_pallas)
        sc = correlate_syncs_device(soft, names)
        best_def = jnp.argmax(sc, axis=1)
        bs = jnp.max(sc, axis=1)
        vals, idx = jax.lax.top_k(bs, K)            # [Cl, K]
        # device NID decode at the candidate positions
        gpos = jnp.clip(idx[:, :, None] + jnp.asarray(nid_strip),
                        0, dibits.shape[1] - 1)
        nd = dibits[jnp.arange(Cl)[:, None, None], gpos]
        b64 = jnp.stack([(nd >> 1) & 1, nd & 1], axis=-1
                        ).reshape(Cl, K, 64)
        s = (1.0 - 2.0 * b64[..., :63].astype(jnp.float32))
        msg = jnp.argmax(s.reshape(-1, 63) @ jnp.asarray(bch_pm).T,
                         axis=-1).reshape(Cl, K)
        duid = msg & 0xF
        inv = jnp.take_along_axis(best_def, idx, axis=1) & 1
        valid = ((vals >= sync_threshold)
                 & ((duid == 5) | (duid == 10))
                 & (inv == 0)
                 & (idx + need < n_sym))            # [Cl, K]
        ldu_ch = jnp.where(valid,
                           jnp.arange(Cl)[:, None],
                           Cl).reshape(-1).astype(jnp.int32)
        ldu_pos = idx.reshape(-1).astype(jnp.int32)
        # fresh prediction state, marked device-varying so the scan
        # carry types match under shard_map's varying-axis check
        prev_logm = jax.lax.pcast(jnp.zeros((Cl, 56), jnp.float32),
                                  ("ch",), to="varying")
        prev_L = jax.lax.pcast(jnp.zeros(Cl, jnp.int32), ("ch",),
                               to="varying")
        pcm, _logm, _L, _synth, _aux = voice_decode_gather(
            dibits, ldu_ch, ldu_pos, jnp.asarray(frame_offs),
            jnp.asarray(fch_base), jnp.asarray(forder),
            prev_logm, prev_L, Cl, n_steps)
        fleet_power = jax.lax.pmean(jnp.mean(power), "ch")
        return pcm.reshape(Cl, -1), fleet_power

    in_shard = NamedSharding(mesh, P("ch", None, None))
    step = jax.jit(shard_map(
        local_step, mesh=mesh,
        in_specs=P("ch", None, None),
        out_specs=(P("ch", None), P())))
    return step, in_shard


def dryrun_multichip(n_devices: int) -> None:
    """Driver contract: N-device mesh, jit the sharded steps over real
    channel-parallel shardings, run ONE step of each on tiny shapes —
    the front end alone, then the FULL voice chain (sync + NID + LDU
    gather + IMBE ECC + dequant + synthesis) under the mesh."""
    devs = np.array(jax.devices()[:n_devices])
    assert devs.size == n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")
    mesh = Mesh(devs, axis_names=("ch",))
    C = max(n_devices * 2, 8)          # 2+ channels per device
    B = 4800                            # 0.1 s per channel — tiny
    step, in_shard = make_sharded_frontend(mesh, "p25p1", C, B)
    rng = np.random.default_rng(0)
    iq = rng.normal(size=(C, B, 2)).astype(np.float32)
    x = jax.device_put(iq, in_shard)
    dibits, soft, power, fleet = step(x)
    jax.block_until_ready((dibits, soft, power, fleet))
    assert dibits.shape[0] == C
    assert np.isfinite(float(fleet))

    vstep, v_shard = make_sharded_voice_step(mesh, C, B)
    xv = jax.device_put(iq, v_shard)
    pcm, vfleet = vstep(xv)
    jax.block_until_ready((pcm, vfleet))
    assert pcm.shape == (C, 2 * 9 * 160)
    assert np.isfinite(np.asarray(pcm)).all()
    assert np.isfinite(float(vfleet))
