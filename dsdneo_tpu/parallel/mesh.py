"""Multi-chip scaling: shard the channel axis over the ICI mesh.

The decode workload is embarrassingly parallel over channels — the
reference's equivalent of "many processes, one channel each"
(SURVEY.md §2.8) — so the natural mesh layout is channels over devices
with NO cross-channel collectives in the hot path.  Collectives appear
only for fleet-level metrics (psum of power/valid counters), which ride
the ICI.

``dryrun_multichip`` is the driver contract: build an N-device mesh,
jit the full sharded step, run one step on tiny shapes.
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


def training_step(mesh: Mesh, C: int, B: int, mode_name: str = "p25p1"):
    """The full per-step device program over a mesh (decode serving has
    no gradient step; this is the 'training step' analogue: front-end +
    batched FEC metric reduction)."""
    return make_sharded_frontend(mesh, mode_name, C, B)


def dryrun_multichip(n_devices: int) -> None:
    """Driver contract: N-device mesh, jit the full sharded step over
    real channel-parallel shardings, run ONE step on tiny shapes."""
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
