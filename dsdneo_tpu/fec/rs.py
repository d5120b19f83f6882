"""Reed-Solomon decoding over GF(2^m) (Berlekamp-Massey + Chien + Forney).

Covers the protocol RS codes:
  - P25 hexbit codes (GF(64), x^6+x+1): RS(36,20,17), RS(24,12,13),
    RS(24,16,9) — shortened from RS(63,·) (reference parity:
    include/dsd-neo/fec/ReedSolomon.hpp:62-1060).
  - DMR RS(12,9,4) over GF(256) (reference src/fec/rs-12-9.c).

Exact integer semantics on host; erasure support for soft-reliability
paths (reference parity: src/protocol/p25/phase1/p25p1_rs_soft_reliability.cpp).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from dsdneo_tpu.fec.gf import GF2m


class ReedSolomon:
    """RS(n, k) over GF(2^m), possibly shortened from (q-1, k+(q-1-n)).

    Codeword symbol order: data symbols first, then parity.  Internally
    position ``pos`` (0-based from the start) corresponds to the
    polynomial coefficient of degree ``n-1-pos`` with locator
    X = alpha^(n-1-pos+pad) where pad = (q-1) - n.
    """

    def __init__(self, n: int, k: int, m: int = 6, prim_poly: int | None = None,
                 fcr: int = 1):
        self.f = GF2m(m, prim_poly)
        self.n = n
        self.k = k
        self.nroots = n - k
        self.fcr = fcr
        self.pad = 0  # shortened codes handled pad-free: locators alpha^(n-1-pos) stay distinct for n <= q-1
        f = self.f
        # generator poly g(x) = prod (x - alpha^(fcr+i)), lowest degree first
        g = [1]
        for i in range(self.nroots):
            root = f.pow_alpha(fcr + i)
            ng = [0] * (len(g) + 1)
            for j, c in enumerate(g):
                ng[j + 1] ^= c                      # x * c_j
                ng[j] ^= int(f.mul(c, root))        # root * c_j
            g = ng
        self.genpoly = g

    def _gmul(self, a: int, b: int) -> int:
        if a == 0 or b == 0:
            return 0
        f = self.f
        return int(f.exp_table[(int(f.log_table[a]) + int(f.log_table[b])) % (f.q - 1)])

    def _gpow(self, base_log: int, e: int) -> int:
        f = self.f
        return int(f.exp_table[(base_log * e) % (f.q - 1)])

    def _ginv(self, a: int) -> int:
        f = self.f
        return int(f.exp_table[(f.q - 1 - int(f.log_table[a])) % (f.q - 1)])

    # -- encoding ---------------------------------------------------------
    def encode(self, data: np.ndarray) -> np.ndarray:
        """data: [k] symbols → codeword [n] (data ‖ parity)."""
        msg = np.asarray(data, dtype=np.int32)
        rem = [0] * self.nroots  # rem[0] = highest degree of remainder
        gp_hi = self.genpoly[::-1]  # highest degree first; gp_hi[0] == 1
        for d in msg:
            feedback = int(d) ^ rem[0]
            rem = rem[1:] + [0]
            if feedback:
                for j in range(self.nroots):
                    rem[j] ^= self._gmul(gp_hi[j + 1], feedback)
        return np.concatenate([msg, np.asarray(rem, dtype=np.int32)])

    def _syndromes(self, r: np.ndarray) -> list[int]:
        synd = []
        for i in range(self.nroots):
            x = self.f.pow_alpha(self.fcr + i)
            acc = 0
            for c in r:  # r[0] is highest-degree coefficient
                acc = self._gmul(acc, x) ^ int(c)
            synd.append(acc)
        return synd

    # -- decoding ---------------------------------------------------------
    def decode(self, word: np.ndarray, erasures: list[int] | None = None
               ) -> tuple[np.ndarray, int]:
        """Decode [n] received symbols.

        Returns (corrected codeword, number of corrected symbols);
        count is -1 when decoding fails.
        """
        f = self.f
        r = np.asarray(word, dtype=np.int32).copy()
        n, nroots = self.n, self.nroots
        S = self._syndromes(r)
        if not any(S):
            return r, 0

        # erasure locator  Lam(z) = prod (1 - X_j z), lowest degree first
        lam = [1] + [0] * nroots
        n_eras = 0
        if erasures:
            for pos in sorted(set(erasures)):
                if n_eras >= nroots or pos >= n:
                    continue
                X = f.pow_alpha(n - 1 - pos + self.pad)
                for j in range(nroots, 0, -1):
                    lam[j] ^= self._gmul(lam[j - 1], X)
                n_eras += 1

        # Berlekamp-Massey with erasures folded in
        B = lam.copy()
        L = n_eras
        for i in range(n_eras, nroots):
            delta = 0
            for j in range(L + 1):
                delta ^= self._gmul(lam[j], S[i - j])
            B = [0] + B[:-1]  # B *= z
            if delta != 0:
                T = [lam[j] ^ self._gmul(B[j], delta) for j in range(nroots + 1)]
                if 2 * L <= i + n_eras:
                    inv_d = self._ginv(delta)
                    B = [self._gmul(c, inv_d) for c in lam]
                    L = i + 1 + n_eras - L
                lam = T
        deg_lam = 0
        for j in range(nroots, -1, -1):
            if lam[j]:
                deg_lam = j
                break
        if deg_lam == 0:
            return r, -1

        # Chien search: roots at X_j^{-1}
        err_pos = []
        for pos in range(n):
            Xlog = (n - 1 - pos + self.pad) % (f.q - 1)
            Xinv_log = (f.q - 1 - Xlog) % (f.q - 1)
            acc = 0
            for j in range(deg_lam + 1):
                if lam[j]:
                    acc ^= self._gmul(lam[j], self._gpow(Xinv_log, j))
            if acc == 0:
                err_pos.append(pos)
        if len(err_pos) != deg_lam:
            return r, -1

        # Omega(z) = S(z)·Lam(z) mod z^nroots
        omega = [0] * nroots
        for i in range(nroots):
            acc = 0
            for j in range(min(i, deg_lam) + 1):
                acc ^= self._gmul(lam[j], S[i - j])
            omega[i] = acc

        for pos in err_pos:
            Xlog = (n - 1 - pos + self.pad) % (f.q - 1)
            Xinv_log = (f.q - 1 - Xlog) % (f.q - 1)
            num = 0
            for i in range(nroots):
                if omega[i]:
                    num ^= self._gmul(omega[i], self._gpow(Xinv_log, i))
            den = 0
            for j in range(1, deg_lam + 1, 2):
                if lam[j]:
                    den ^= self._gmul(lam[j], self._gpow(Xinv_log, j - 1))
            if den == 0:
                return r, -1
            mag = self._gmul(num, self._ginv(den))
            # account for fcr != 1: e = X^(1-fcr) * Omega(X^-1)/Lam'(X^-1)
            if self.fcr != 1:
                mag = self._gmul(mag, self._gpow(Xlog, (1 - self.fcr) % (f.q - 1)))
            r[pos] ^= mag

        if any(self._syndromes(r)):
            return r, -1
        return r, len(err_pos)


@lru_cache(maxsize=None)
def rs_24_12_13() -> ReedSolomon:
    """P25 RS(24,12,13) — LDU1 link control (shortened GF(64) code)."""
    return ReedSolomon(24, 12, m=6, fcr=1)


@lru_cache(maxsize=None)
def rs_24_16_9() -> ReedSolomon:
    """P25 RS(24,16,9) — LDU2 encryption sync."""
    return ReedSolomon(24, 16, m=6, fcr=1)


@lru_cache(maxsize=None)
def rs_36_20_17() -> ReedSolomon:
    """P25 RS(36,20,17) — HDU."""
    return ReedSolomon(36, 20, m=6, fcr=1)


@lru_cache(maxsize=None)
def rs_63_35() -> ReedSolomon:
    """P25 Phase 2 RS(63,35,29) over GF(64) — SACCH/FACCH/ESS
    (reference src/fec/ez.cpp ezpwd::RS<63,35>, poly 0x43 fcr 1)."""
    return ReedSolomon(63, 35, m=6, fcr=1)


@lru_cache(maxsize=None)
def rs_12_9() -> ReedSolomon:
    """DMR RS(12,9,4) over GF(256) (ETSI TS 102 361-1 B.3.6)."""
    return ReedSolomon(12, 9, m=8, prim_poly=0b100011101, fcr=0)
