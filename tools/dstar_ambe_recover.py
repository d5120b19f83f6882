#!/usr/bin/env python3
"""Reproduce the D-STAR AMBE 3600x2400 ECC recovery (PARITY.md).

Order-free GF(2) derivation of the voice-frame code structure from the
off-air dstar fixture, then validation of the production decoder:

  1. harvest voice frames via engine.dstarbatch (the chain gate accepts
     the superframes the serial threshold drops) + the trailing partial
     superframe;
  2. exact nullspace of the [N, 72] frame matrix → C0: a 12-dim dual on
     exactly 24 positions whose weight enumerator is the extended
     Golay's;
  3. same-C0 XOR pairs cancel the C1 PN → residue-set search exposes
     C1's 24 positions (rank 12 vs ≥17 for every wrong set);
  4. the production decoder (protocol/dstar/ambe2400.py) must decode
     every harvested frame with ZERO corrections.

Usage: python tools/dstar_ambe_recover.py [fixture.iq.json]
"""

import os
import sys
from itertools import combinations

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FX = "/root/reference/tests/fixtures/iq/dstar.iq.json"


def rref(M):
    M = M.copy() % 2
    r, piv = 0, []
    for c in range(M.shape[1]):
        rows = np.where(M[r:, c] == 1)[0]
        if rows.size == 0:
            continue
        M[[r, r + rows[0]]] = M[[r + rows[0], r]]
        mask = (M[:, c] == 1)
        mask[r] = False
        M[mask] ^= M[r]
        piv.append(c)
        r += 1
        if r == M.shape[0]:
            break
    return r, piv, M[:r]


def nullspace(M):
    r, piv, R = rref(M)
    free = [c for c in range(M.shape[1]) if c not in piv]
    out = []
    for f in free:
        h = np.zeros(M.shape[1], np.uint8)
        h[f] = 1
        for i, p in enumerate(piv):
            h[p] = R[i, f]
        out.append(h)
    return np.array(out, np.uint8).reshape(len(out), M.shape[1])


def weight_enum(basis):
    """Weight enumerator of the span of ``basis`` (excluding 0)."""
    dim = basis.shape[0]
    ws = {}
    for m in range(1, 1 << dim):
        h = np.zeros(basis.shape[1], np.uint8)
        for i in range(dim):
            if (m >> i) & 1:
                h ^= basis[i]
        w = int(h.sum())
        ws[w] = ws.get(w, 0) + 1
    return dict(sorted(ws.items()))


EXT_GOLAY_ENUM = {8: 759, 12: 2576, 16: 759, 24: 1}


def harvest(path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dsdneo_tpu.engine.dstarbatch import BatchedDstarPipeline
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(path)
    iq = np.stack([samples.real, samples.imag], axis=-1).astype(np.float32)
    pipe = BatchedDstarPipeline(1, fs=float(meta.sample_rate_hz))
    pipe.decode_block_events(iq[None])
    frames = [v for ev in pipe.events(0) if "voice" in ev.fields
              for v in ev.fields["voice"]]
    # trailing superframe whose 2016-dibit extent misses the block end
    dib, pat, pos, vq, n_sym = pipe.frontend_sync_device(iq[None])
    dd = np.asarray(dib)[0]
    accepted = {ev.pos for ev in pipe.events(0) if "voice" in ev.fields}
    sc = vq[0].astype(np.float32) / 127.0
    for p, k, s in zip(pos[0], pat[0], sc):
        t = int(p)
        if k != 0 or s < pipe.threshold or t in accepted:
            continue
        if not any(abs(abs(t - a) - 2016) <= 2 for a in accepted):
            continue
        for j in range(21):
            st = t + 24 + 96 * j
            if st + 72 <= n_sym:
                frames.append(((dd[st:st + 72] >> 1) & 1).astype(np.uint8))
    return np.unique(np.stack(frames), axis=0)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else FX
    V = harvest(path)
    print(f"harvested {V.shape[0]} distinct off-air frames")

    # -- step 2: C0 via exact nullspace ---------------------------------
    r, _, _ = rref(V)
    H = nullspace(V)
    supp = np.where(H.any(axis=0))[0]
    enum = weight_enum(H)
    print(f"rank {r}; dual dim {H.shape[0]} on {supp.size} positions")
    print(f"dual weight enumerator: {enum}")
    assert H.shape[0] == 12 and supp.size == 24, "C0 structure not found"
    assert enum == EXT_GOLAY_ENUM, "dual is not the extended Golay"
    pair_res = sorted({(p % 24) // 2 for p in supp})
    print(f"C0 = extended Golay(24,12) on pair residues {pair_res}")

    # -- step 3: C1 via same-C0 XOR pairs --------------------------------
    keys = [bytes(row) for row in V[:, supp]]
    groups = {}
    for i, k in enumerate(keys):
        groups.setdefault(k, []).append(i)
    X = np.array([V[idx[0]] ^ V[j]
                  for idx in groups.values() for j in idx[1:]], np.uint8)
    print(f"{X.shape[0]} same-C0 XOR samples")
    rest = sorted(set(range(12)) - set(pair_res))
    scores = []
    for combo in combinations(rest, 4):
        cols = np.array(sorted(24 * g + 2 * q + b for g in range(3)
                               for q in combo for b in (0, 1)))
        scores.append((rref(X[:, cols])[0], combo))
    scores.sort()
    best_rank, best = scores[0]
    print(f"C1 residue search: best {best} rank {best_rank}, "
          f"runner-up rank {scores[1][0]}")
    assert best_rank == 12 and scores[1][0] > 12, "C1 set ambiguous"

    # -- step 4: production decoder zero-error validation ----------------
    from dsdneo_tpu.protocol.dstar.ambe2400 import decode_dstar_ambe_ecc
    errs = np.array([decode_dstar_ambe_ecc(f)[1] for f in V])
    print(f"production ECC corrections: mean {errs.mean():.3f} "
          f"max {errs.max()} over {len(errs)} frames (random floor ~2.4)")
    assert errs.max() == 0, "decoder does not match the derived structure"
    print("RECOVERY REPRODUCED: zero corrections on every off-air frame")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
