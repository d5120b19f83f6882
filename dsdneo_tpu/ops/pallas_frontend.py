"""Pallas TPU kernel: fused channel-FIR + FM discriminator.

The serving hot path (engine/batched.py frontend_step) spends its time
in the 143-tap channel low-pass and the atan2 discriminator — in the
reference these are the per-sample loops of src/dsp/simd_fir.cpp and
src/dsp/fsk_modem.c.  Here the FIR is reformulated as a banded matmul
so it runs on the MXU instead of the VPU, and the discriminator is
fused in-register so the filtered complex signal never round-trips
through HBM:

  - the input stream is viewed as frames of 128 samples; each grid step
    loads three adjacent 128-sample blocks (the frame plus a one-frame
    halo each side) per I/Q plane,
  - a precomputed band matrix ``H [384, 256]`` holds the taps twice,
    shifted by one sample, so a single ``[C,384] @ [384,256]`` matmul
    yields both ``y[n]`` and ``y[n-1]`` for all 128 output lanes,
  - ``disc = atan2(Im(y·conj(y_prev)), Re(y·conj(y_prev)))/pi`` is
    computed on the VPU and only the [C, 128] float32 result is written
    back.

HBM traffic per step: 3 reads of the input frame + 1 write of the
discriminator — versus the unfused chain's filtered-complex
intermediate (2x the input) plus separate discriminator pass.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

FRAME = 128          # output lanes per grid step
KWIN = 3 * FRAME     # input window: frame + one-frame halo each side


def band_matrix(taps: np.ndarray) -> np.ndarray:
    """Taps → band matrix ``H [KWIN, 2*FRAME]``.

    Column ``j < FRAME`` produces ``y[n-1]`` and column ``FRAME+j``
    produces ``y[n]`` for output lane ``j``, matching the 'same'
    alignment of dsp.frontend.fir_complex: ``y[n] = sum_t taps[t] *
    x[n + (T-1)//2 - t]``.  Window position ``k`` maps to sample
    ``n0 + k - FRAME`` where ``n0`` is the frame start.
    """
    taps = np.asarray(taps, dtype=np.float32)
    t = len(taps)
    centre = (t - 1) // 2
    if FRAME - 1 + FRAME + centre >= KWIN or centre + 1 > FRAME:
        raise ValueError(f"taps too long for window: {t}")
    h = np.zeros((KWIN, 2 * FRAME), dtype=np.float32)
    k = np.arange(KWIN)
    for j in range(FRAME):
        m_cur = FRAME + j + centre - k          # tap index feeding y[n]
        sel = (m_cur >= 0) & (m_cur < t)
        h[k[sel], FRAME + j] = taps[m_cur[sel]]
        m_prev = m_cur - 1                      # same, shifted: y[n-1]
        sel = (m_prev >= 0) & (m_prev < t)
        h[k[sel], j] = taps[m_prev[sel]]
    return h


# atan(z) = z * P(z^2) on [0, 1]; least-squares fit, max err 2e-8
# (Mosaic has no atan2 lowering, so the quadrant reduction is built
# from VPU select/multiply primitives)
_ATAN_C = (9.9999989997e-01, -3.3332674306e-01, 1.9987152763e-01,
           -1.4170064146e-01, 1.0531652562e-01, -7.3027104041e-02,
           4.0575162432e-02, -1.4890371855e-02, 2.5799282932e-03)


def _atan2(y, x):
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, np.float32(1e-30))
    u = z * z
    p = jnp.float32(_ATAN_C[-1])
    for c in reversed(_ATAN_C[:-1]):
        p = p * u + np.float32(c)
    a = z * p
    a = jnp.where(ay > ax, np.float32(np.pi / 2) - a, a)
    a = jnp.where(x < 0, np.float32(np.pi) - a, a)
    return jnp.where(y < 0, -a, a)


GROUPS = 4           # output groups of FRAME lanes per grid step
STEP = GROUPS * FRAME
HALF = 2 * FRAME     # window padding alignment unit


def _kernel(h_ref, x0r, x1r, x2r, x3r, x0i, x1i, x2i, x3i, out_ref):
    wr = jnp.concatenate([x0r[:], x1r[:], x2r[:], x3r[:]], axis=1)
    wi = jnp.concatenate([x0i[:], x1i[:], x2i[:], x3i[:]], axis=1)
    h = h_ref[:]
    inv_pi = np.float32(1.0 / np.pi)
    for g in range(GROUPS):
        lo = FRAME + g * FRAME
        yr = jnp.dot(wr[:, lo:lo + KWIN], h,
                     preferred_element_type=jnp.float32)   # [C, 2*FRAME]
        yi = jnp.dot(wi[:, lo:lo + KWIN], h,
                     preferred_element_type=jnp.float32)
        ypr, ycr = yr[:, :FRAME], yr[:, FRAME:]
        ypi, yci = yi[:, :FRAME], yi[:, FRAME:]
        re = ycr * ypr + yci * ypi        # y[n] * conj(y[n-1])
        im = yci * ypr - ycr * ypi
        out_ref[:, g * FRAME:(g + 1) * FRAME] = _atan2(im, re) * inv_pi


@partial(jax.jit, static_argnames=("interpret",))
def _call(h: jax.Array, xr: jax.Array, xi: jax.Array,
          interpret: bool = False) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c8, npad = xr.shape
    f = (npad - STEP) // STEP
    # window for step i: padded samples [STEP*i, STEP*i + STEP + 2*FRAME)
    # as four (c8, HALF) blocks at half-step indices 2i .. 2i+3
    xspec = lambda off: pl.BlockSpec(
        (c8, HALF), lambda i, off=off: (0, 2 * i + off),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(f,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  xspec(0), xspec(1), xspec(2), xspec(3),
                  xspec(0), xspec(1), xspec(2), xspec(3)],
        out_specs=pl.BlockSpec((c8, STEP), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c8, f * STEP), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * c8 * KWIN * 2 * FRAME * GROUPS * f,
            bytes_accessed=(8 * c8 * HALF + c8 * STEP) * 4 * f,
            transcendentals=c8 * STEP * f),
        interpret=interpret,
    )(h, xr, xr, xr, xr, xi, xi, xi, xi)


def fir_discriminate(xr: jax.Array, xi: jax.Array, taps: np.ndarray,
                     interpret: bool = False) -> jax.Array:
    """Fused FIR + FM discriminator: ``[C, B]`` I/Q planes → disc ``[C, B]``.

    Bit-compatible with ``fm_discriminate(fir_complex(x, taps))`` from
    dsp.frontend (including out[:, 0] == 0).
    """
    c, b = xr.shape
    f = -(-b // STEP)
    c8 = -(-c // 8) * 8
    h = jnp.asarray(_cached_band(tuple(np.asarray(taps, np.float32).tolist())))
    # front: HALF so window position 0 of step 0 sits at sample -FRAME;
    # back: the final step's window spans a full extra STEP
    pad = ((0, c8 - c), (HALF, f * STEP + STEP - HALF - b))
    xr = jnp.pad(xr, pad)
    xi = jnp.pad(xi, pad)
    disc = _call(h, xr, xi, interpret=interpret)
    return disc[:c, :b].at[:, 0].set(0.0)


@lru_cache(maxsize=16)
def _cached_band(taps_key: tuple) -> np.ndarray:
    return band_matrix(np.array(taps_key, dtype=np.float32))
