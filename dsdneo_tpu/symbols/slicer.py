"""Symbol level estimation + dibit slicing (batched, windowed).

The reference tracks min/max/center peaks per symbol in a feedback
fashion (src/core/frames/dsd_dibit.c digitize:1022, thresholds lmid/umid)
— again a serial recurrence.  Here levels are estimated per window of
symbols with robust quantiles, then every symbol in the window is sliced
in parallel.

Dibit convention (DSD alphabet, matches reference sync strings in
include/dsd-neo/core/sync_patterns.h):

  symbol +3 → dibit 1,  +1 → dibit 0,  -1 → dibit 2,  -3 → dibit 3

so dibit bit1 = sign (1 = negative), and for 4-level the magnitude picks
between inner/outer levels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# symbol value of each dibit in the DSD alphabet
DIBIT_LEVELS = np.array([1.0, 3.0, -1.0, -3.0], dtype=np.float32)


@partial(jax.jit, static_argnames=("win", "four_level"))
def estimate_levels(sym: jax.Array, win: int = 512, four_level: bool = True):
    """Per-window (center, scale) estimates for ``[C, K]`` symbols.

    scale is the outer-level amplitude (value of a +3 symbol above center
    for 4-level; the binary level for 2-level).  Returns arrays expanded
    back to ``[C, K]`` (step function per window).
    """
    c, k = sym.shape
    win = min(win, k)            # short captures: one window over it all
    nw = max(k // win, 1)
    body = sym[:, : nw * win].reshape(c, nw, win)
    hi = jnp.quantile(body, 0.98, axis=-1)
    lo = jnp.quantile(body, 0.02, axis=-1)
    center = (hi + lo) * 0.5
    scale = jnp.maximum((hi - lo) * 0.5, 1e-6)
    # broadcast back to per-symbol, covering the tail with the last window
    reps = (k + win - 1) // win
    center_full = jnp.repeat(center, win, axis=-1)
    scale_full = jnp.repeat(scale, win, axis=-1)
    if reps > nw:
        pad = k - nw * win
        center_full = jnp.concatenate([center_full, jnp.repeat(center[:, -1:], pad, axis=-1)], axis=-1)
        scale_full = jnp.concatenate([scale_full, jnp.repeat(scale[:, -1:], pad, axis=-1)], axis=-1)
    return center_full[:, :k], scale_full[:, :k]


@partial(jax.jit, static_argnames=("win", "four_level"))
def slice_dibits(sym: jax.Array, win: int = 512, four_level: bool = True):
    """Slice ``[C, K]`` soft symbols → (dibits uint8 ``[C, K]``,
    normalized soft symbols ``[C, K]`` scaled so outer level ≈ ±3).

    4-level thresholds sit at center and center ± 2/3·scale (midway
    between the ±1 and ±3 levels); 2-level slices at center only.
    Reference parity: src/core/frames/dsd_dibit.c digitize/get_dibit.
    """
    center, scale = estimate_levels(sym, win=win, four_level=four_level)
    norm = (sym - center) / scale * 3.0
    if four_level:
        neg = norm < 0.0
        outer = jnp.abs(norm) > 2.0
        dibit = jnp.where(neg, jnp.where(outer, 3, 2), jnp.where(outer, 1, 0))
    else:
        dibit = jnp.where(norm < 0.0, 3, 1)  # 2-level: ±3 alphabet
    return dibit.astype(jnp.uint8), norm
