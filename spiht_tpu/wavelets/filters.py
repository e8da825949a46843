"""Wavelet filter banks, constructed from first principles.

The reference framework delegates filter banks to PyWavelets (reference:
spiht/spiht_wrapper.py:163 uses ``pywt.wavedec2`` with free wavelet choice,
default ``bior2.2``). This module re-derives the same filter banks
mathematically so the TPU framework is self-contained:

* ``haar`` / ``dbN``    — orthogonal Daubechies family, derived via spectral
  factorization of the half-band polynomial (minimum-phase root selection).
* ``biorNr.Nd``         — biorthogonal spline (CDF) family, derived with exact
  rational arithmetic from the Cohen–Daubechies–Feauveau construction.
  ``bior4.4``/``bior6.8`` follow the MATLAB/pywt convention of
  factoring the complementary polynomial between analysis and synthesis
  ("less dissimilar filter lengths" variant; bior4.4 is the CDF 9/7 pair).
* ``rbioNr.Nd``         — reverse biorthogonal (dec/rec swapped).

Filter-bank conventions match PyWavelets:
  dec_hi[k] = (-1)**(k+1) * rec_lo[k]
  rec_hi[k] = (-1)**k      * dec_lo[k]
and dec_len == rec_len with zero padding:
  dec taps get ceil((len - taps)/2) leading zeros,
  rec taps get floor((len - taps)/2) leading zeros.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from fractions import Fraction
from functools import lru_cache
from typing import List, Sequence, Tuple

import numpy as np

__all__ = ["Wavelet", "build_wavelet", "wavelist", "dwt_max_level", "dwt_coeff_len"]

SQRT2 = math.sqrt(2.0)


@dataclass(frozen=True)
class Wavelet:
    """A discrete wavelet filter bank (two-channel, critically sampled)."""

    name: str
    dec_lo: Tuple[float, ...]
    dec_hi: Tuple[float, ...]
    rec_lo: Tuple[float, ...]
    rec_hi: Tuple[float, ...]
    orthogonal: bool = False
    biorthogonal: bool = False

    @property
    def dec_len(self) -> int:
        return len(self.dec_lo)

    @property
    def rec_len(self) -> int:
        return len(self.rec_lo)

    def filter_bank(self):
        return (
            list(self.dec_lo),
            list(self.dec_hi),
            list(self.rec_lo),
            list(self.rec_hi),
        )


def _binom(n: int, k: int) -> Fraction:
    return Fraction(math.comb(n, k))


def _poly_mul(a: Sequence[Fraction], b: Sequence[Fraction]) -> List[Fraction]:
    out = [Fraction(0)] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            out[i + j] += ai * bj
    return out


def _spline_lowpass(order: int) -> List[Fraction]:
    """B-spline synthesis scaling filter (before sqrt(2) scaling).

    m0(w) = (cos(w/2))**order  ->  taps 2**-order * binom(order, k).
    """
    return [_binom(order, k) / Fraction(2) ** order for k in range(order + 1)]


def _complementary_poly(L: int) -> List[Fraction]:
    """P(y) = sum_{m=0}^{L-1} binom(L-1+m, m) y**m  (Daubechies half-band)."""
    return [_binom(L - 1 + m, m) for m in range(L)]


def _cos2_to_taps(nd: int, q_taps: Sequence[float]) -> List[float]:
    """Expand m0(w) = cos(w/2)**nd * q(sin^2(w/2)) into filter taps.

    Uses z-domain identities with x = e^{-iw}:
      cos(w/2)**2  -> (1 + x)(1 + 1/x)/4   (centered 3-tap [1,2,1]/4)
      sin(w/2)**2  -> -(1 - x)(1 - 1/x)/4  (centered 3-tap [-1,2,-1]/4)
    For odd nd there is an extra half-sample delay giving even tap count.
    Returns the tap list (ascending index), NOT yet scaled by sqrt(2).
    """
    # Represent centered Laurent polynomials as coefficient lists.
    cos2 = [0.25, 0.5, 0.25]  # cos^2(w/2) as [x^-1, 1, x]
    sin2 = [-0.25, 0.5, -0.25]

    def pmulf(a, b):
        out = [0.0] * (len(a) + len(b) - 1)
        for i, ai in enumerate(a):
            for j, bj in enumerate(b):
                out[i + j] += ai * bj
        return out

    # q(sin^2) expansion
    poly = [1.0]
    acc = [float(q_taps[0])]
    for c in q_taps[1:]:
        poly = pmulf(poly, sin2)
        # align acc (shorter) center with poly center, then add c*poly
        grow = (len(poly) - len(acc)) // 2
        acc = [0.0] * grow + acc + [0.0] * grow
        acc = [a + float(c) * p for a, p in zip(acc, poly)]

    # multiply by cos(w/2)**nd
    npairs = nd // 2
    for _ in range(npairs):
        acc = pmulf(acc, cos2)
    if nd % 2 == 1:
        # cos(w/2) * e^{-iw/2} = (1 + x)/2
        acc = pmulf(acc, [0.5, 0.5])
    return acc


def _pad_filters(dec: List[float], rec: List[float]) -> Tuple[List[float], List[float]]:
    """Zero-pad dec/rec taps to a common even length, pywt style."""
    total = max(len(dec), len(rec))
    if total % 2 == 1:
        total += 1
    dl = total - len(dec)
    rl = total - len(rec)
    dec = [0.0] * ((dl + 1) // 2) + dec + [0.0] * (dl // 2)
    rec = [0.0] * (rl // 2) + rec + [0.0] * ((rl + 1) // 2)
    return dec, rec


def _qmf_pair(dec_lo: List[float], rec_lo: List[float]):
    dec_hi = [((-1.0) ** (k + 1)) * v for k, v in enumerate(rec_lo)]
    rec_hi = [((-1.0) ** k) * v for k, v in enumerate(dec_lo)]
    return dec_hi, rec_hi


def _build_bior(nr: int, nd: int) -> Tuple[List[float], List[float]]:
    """CDF biorthogonal spline filters (dec_lo, rec_lo), incl. sqrt2 scale.

    nr: reconstruction spline order, nd: decomposition order (pywt biorNr.Nd).
    bior4.4 / bior6.8 use the factored ("less dissimilar lengths") convention,
    all other members are pure spline. (bior5.5 uses yet another construction
    in MATLAB/pywt and is not supported.)
    """
    if (nr + nd) % 2 != 0:
        raise ValueError(f"bior{nr}.{nd}: nr+nd must be even")
    L = (nr + nd) // 2
    P = _complementary_poly(L)  # degree L-1 polynomial in y = sin^2(w/2)

    if (nr, nd) in ((4, 4), (6, 8)):
        # "Less dissimilar filter lengths" convention (MATLAB/pywt): factor P
        # between synthesis and analysis. Synthesis gets the real root(s) when
        # P has them (bior4.4 -> the CDF 9/7 pair); otherwise it gets the
        # conjugate pair whose real part is smallest in magnitude (bior6.8,
        # reproducing the published CDF 17/11 values).
        coeffs = [float(c) for c in P][::-1]  # numpy.roots wants descending
        roots = np.roots(coeffs)
        real_roots = sorted(
            (r.real for r in roots if abs(r.imag) < 1e-9), key=lambda v: v
        )
        cplx_roots = [r for r in roots if r.imag > 1e-9]  # one per conj pair

        def mul_real(q, r):
            # multiply by (1 - y/r), keeps q(0) = 1
            return [a - (b / r) for a, b in zip(q + [0.0], [0.0] + q)]

        def mul_cplx(q, r):
            # (1 - y/r)(1 - y/conj(r)) = 1 - 2Re(1/r) y + y^2/|r|^2
            m = abs(r) ** 2
            fac = [1.0, -2.0 * r.real / m, 1.0 / m]
            out = [0.0] * (len(q) + 2)
            for i, a in enumerate(q):
                for j, b in enumerate(fac):
                    out[i + j] += a * b
            return out

        q_rec, q_dec = [1.0], [1.0]
        if real_roots:
            for r in real_roots:
                q_rec = mul_real(q_rec, r)
            rec_pairs = []
        else:
            rec_pairs = [min(cplx_roots, key=lambda r: abs(r.real))]
            q_rec = mul_cplx(q_rec, rec_pairs[0])
        for r in cplx_roots:
            if r not in rec_pairs:
                q_dec = mul_cplx(q_dec, r)
        dec_taps = _cos2_to_taps(nd, q_dec)
        rec_taps = _cos2_to_taps(nr, q_rec)
    else:
        # Pure spline: all of P goes to the decomposition side.
        dec_taps = _cos2_to_taps(nd, [float(c) for c in P])
        rec_taps = _cos2_to_taps(nr, [1.0])

    dec_lo = [SQRT2 * t for t in dec_taps]
    rec_lo = [SQRT2 * t for t in rec_taps]
    return dec_lo, rec_lo


def _build_daubechies(N: int) -> List[float]:
    """Daubechies dbN rec_lo via spectral factorization (minimum phase)."""
    if N == 1:
        h = [1.0 / SQRT2, 1.0 / SQRT2]
        return h
    # P(y) of degree N-1; roots in y, map to z via y = (2 - z - 1/z)/4
    P = [float(c) for c in _complementary_poly(N)]
    yroots = np.roots(P[::-1])
    zroots = []
    for y in yroots:
        # solve z^2 - (2 - 4y) z + 1 = 0; pick |z| < 1 (min phase)
        b = 2.0 - 4.0 * y
        disc = np.sqrt(b * b - 4.0 + 0j)
        z1 = (b + disc) / 2.0
        z2 = (b - disc) / 2.0
        zroots.append(z1 if abs(z1) <= 1.0 else z2)
    # h(z) = sqrt2 * ((1+z)/2)^N * prod (z - zk)/(1 - zk)  (normalized at z=1)
    poly = np.array([1.0 + 0j])
    for _ in range(N):
        poly = np.convolve(poly, [0.5, 0.5])
    for zk in zroots:
        poly = np.convolve(poly, np.array([-zk, 1.0]) / (1.0 - zk))
    h = (np.real(poly) * SQRT2).tolist()
    return h


@lru_cache(maxsize=None)
def build_wavelet(name: str) -> Wavelet:
    """Build a named wavelet filter bank (pywt-compatible naming)."""
    name = name.lower().strip()
    if name == "haar":
        w = build_wavelet("db1")
        return Wavelet(
            "haar", w.dec_lo, w.dec_hi, w.rec_lo, w.rec_hi, orthogonal=True
        )
    if name.startswith("db"):
        N = int(name[2:])
        if not 1 <= N <= 20:
            raise ValueError(f"unsupported wavelet {name}")
        rec_lo = _build_daubechies(N)
        dec_lo = rec_lo[::-1]
        dec_hi, rec_hi = _qmf_pair(dec_lo, rec_lo)
        return Wavelet(
            name,
            tuple(dec_lo),
            tuple(dec_hi),
            tuple(rec_lo),
            tuple(rec_hi),
            orthogonal=True,
        )
    if name.startswith("bior") or name.startswith("rbio"):
        try:
            nr_s, nd_s = name[4:].split(".")
            nr, nd = int(nr_s), int(nd_s)
        except ValueError:
            raise ValueError(f"unsupported wavelet {name}") from None
        valid = {
            (1, 1), (1, 3), (1, 5),
            (2, 2), (2, 4), (2, 6), (2, 8),
            (3, 1), (3, 3), (3, 5), (3, 7), (3, 9),
            (4, 4), (6, 8),
        }
        if (nr, nd) not in valid:
            raise ValueError(f"unsupported wavelet {name}")
        dec_lo, rec_lo = _build_bior(nr, nd)
        if name.startswith("rbio"):
            dec_lo, rec_lo = rec_lo, dec_lo
        dec_lo, rec_lo = _pad_filters(dec_lo, rec_lo)
        dec_hi, rec_hi = _qmf_pair(dec_lo, rec_lo)
        return Wavelet(
            name,
            tuple(dec_lo),
            tuple(dec_hi),
            tuple(rec_lo),
            tuple(rec_hi),
            biorthogonal=True,
        )
    raise ValueError(f"unsupported wavelet {name}")


def wavelist() -> List[str]:
    names = ["haar"] + [f"db{n}" for n in range(1, 21)]
    pairs = [
        (1, 1), (1, 3), (1, 5),
        (2, 2), (2, 4), (2, 6), (2, 8),
        (3, 1), (3, 3), (3, 5), (3, 7), (3, 9),
        (4, 4), (6, 8),
    ]
    names += [f"bior{a}.{b}" for a, b in pairs]
    names += [f"rbio{a}.{b}" for a, b in pairs]
    return names


def dwt_max_level(data_len: int, filter_len: int) -> int:
    """Max useful decomposition level (pywt.dwt_max_level semantics)."""
    if filter_len <= 1 or data_len < filter_len - 1:
        return 0
    return int(math.floor(math.log2(data_len / (filter_len - 1.0))))


def dwt_coeff_len(data_len: int, filter_len: int, mode: str = "reflect") -> int:
    """Output length of a single-level DWT (pywt.dwt_coeff_len semantics)."""
    if data_len < 1:
        raise ValueError("data_len must be >= 1")
    if mode == "periodization":
        return (data_len + 1) // 2
    return (data_len + filter_len - 1) // 2
