"""Adaptive float-sequence formatter matching the reference renderer.

Re-derivation of ``tech.v3.dataset.format-sequence``
(reference src/tech/v3/dataset/format_sequence.clj — itself modeled on R's
print code): given a sequence of doubles, fit ONE shared precision/width so
the column prints aligned, switching the whole sequence to scientific
notation when any element's magnitude crosses the threshold power.

Driver-side rendering utility: this runs over the already-collected printed
slice of a dataset (20-ish rows), never over distributed data, so plain
Python is the right tool — there is no Spark plan to optimize here.

Laws pinned by tests/test_format_sequence.py, which carries the reference's
full regression-vector suite (test/tech/v3/dataset/format_sequence_test.clj):

- precision is fitted per-sequence, not per-value: the max left-width,
  right-digits, and exponent-width over all finite elements are shared;
- ``digits`` (default 8, clamped to 1..10) caps significant decimals; the
  actual right-width shrinks to drop trailing zeros of the rounded value
  (``find-nsig``), but never below 1;
- any element with |power-of-ten| >= ``threshold`` (default 8) flips the
  ENTIRE sequence to scientific notation (threshold 0 forces scientific);
- exponent renders 2 digits, widening to 3 once any |power| > 100, with an
  explicit ``+`` for non-negative exponents;
- NaN / Inf / -Inf / None render right-justified as ``NaN``/``Inf``/``-Inf``
  and count toward the column width (None formats as NaN);
- float32 inputs are formatted from their shortest decimal repr (``str``),
  not their exact double widening, so ``36.351f`` prints ``36.351``.
"""
from __future__ import annotations

import math
from typing import Iterable, List, Optional, Sequence

import numpy as np

_KP_MAX = 22
# powers of ten for precise mantissa shifting; index i holds 10^(i-1)
_TBL = [10.0 ** (i - 1) for i in range(24)]


def _jround(x: float) -> int:
    """Java ``Math.round``: floor(x + 0.5) — NOT banker's rounding."""
    return math.floor(x + 0.5)


def _left(x: float) -> int:
    """Power-of-ten position of the leading digit (floor(log10)+1)."""
    return int(math.floor(math.log10(x))) + 1


def _find_nsig(alpha: int, digits: int) -> int:
    """Shrink ``digits`` by the count of trailing decimal zeros of alpha."""
    a = float(alpha)
    d = digits
    while True:
        a_ = a / 10.0
        if a_ != math.floor(a_):
            return max(1, d)
        a = a_
        d -= 1


def _right(x: float, digits: int) -> int:
    """Max digits needed right of the dot for ``x`` at ``digits`` precision."""
    alpha = _jround(x * _TBL[digits + 1])
    if alpha == 0:
        return 1
    return _find_nsig(alpha, digits)


def _fix_left(x: float, lft: int, e: bool) -> int:
    sgn = 1 if x < 0 else 0
    if e or lft <= 0:
        return sgn + 1
    return sgn + lft


def _precision(x: float, digits: int, threshold: int):
    """(scientific?, exp-width, left-width, right-digits) for one value."""
    if x == 0.0:
        # -0.0 compares equal to 0.0 but renders signed ("-0.0", matching
        # the reference's DecimalFormat output), so its sign must count
        # toward the shared left width or the column loses alignment —
        # the reference's own width fit misses this (format_sequence.clj:56
        # `(zero? x)` swallows the sign); we pin the uniform-width law.
        sgn = 1 if math.copysign(1.0, x) < 0 else 0
        return (False, 0, 1 + sgn, 1)
    digits = max(1, min(10, digits))
    r = abs(x)
    lft = _left(r)
    alft = abs(lft)
    e = alft >= threshold
    if alft < threshold:
        r_prec = r
    elif alft < _KP_MAX:
        r_prec = r * _TBL[1 - lft] if lft < 0 else r / _TBL[lft + 1]
    else:
        div = 10.0 ** (lft - 1)
        if div == 0.0 or math.isinf(div):
            # 10^(lft-1) under/overflows double for subnormal-range inputs
            # (|x| ~ 5e-324): scale in two halves so the mantissa survives
            h1 = (lft - 1) // 2
            r_prec = (r / (10.0 ** h1)) / (10.0 ** (lft - 1 - h1))
        else:
            r_prec = r / div
    rght = _right(r_prec, digits)
    exp = 3 if alft > 100 else 2
    return (e, exp, _fix_left(x, lft, e), rght)


def _to_double(x) -> float:
    # float32 goes through its shortest-repr string so 36.351f -> 36.351,
    # matching the reference's (Double/valueOf (str float)) coercion
    if isinstance(x, np.float32):
        return float(str(x))
    if x is None:
        return math.nan
    return float(x)


def _fit_precision(xs: Sequence[float], digits: int, threshold: int):
    e_acc, exp_acc, lft_acc, rght_acc, nf_len = False, -(2 ** 31), -(2 ** 31), -(2 ** 31), 0
    for raw in xs:
        x = _to_double(raw)
        if math.isfinite(x):
            e, exp, lft, rght = _precision(x, digits, threshold)
            if e and threshold > 0:
                # one out-of-range element flips the whole sequence
                return _fit_precision(xs, digits, 0)
            e_acc = e_acc or e
            exp_acc = max(exp_acc, exp)
            lft_acc = max(lft_acc, lft)
            rght_acc = max(rght_acc, rght)
        else:
            nf_len = max(nf_len, 4 if x == -math.inf else 3)
    return (e_acc, exp_acc, lft_acc, rght_acc, nf_len)


def formatter(xs: Sequence, digits: int = 8, threshold: int = 8):
    """Fit the shared precision over ``xs`` and return a value->str fn."""
    e, exp, lft, rght, nf_len = _fit_precision(xs, digits, threshold)
    w = max(nf_len, (lft + rght + exp + 3) if e else (lft + rght + 1))

    def fmt(raw) -> str:
        x = _to_double(raw)
        if not math.isfinite(x):
            s = "NaN" if math.isnan(x) else ("Inf" if x > 0 else "-Inf")
        elif e:
            # one leading mantissa digit, rght decimals, exp-wide exponent
            # with an explicit sign (DecimalFormat "0.0...0E0..0" + the
            # reference's E -> E+ insertion for non-negative exponents)
            mant = f"{x:.{rght}E}"
            m, p = mant.split("E")
            sign, mag = p[0], p[1:].lstrip("0") or "0"
            s = f"{m}E{'-' if sign == '-' else '+'}{mag.zfill(exp)}"
        else:
            s = f"{x:.{rght}f}"
        return s.rjust(w)

    return fmt


def format_sequence(xs: Iterable, digits: int = 8, threshold: int = 8) -> List[str]:
    """Format ``xs`` (doubles/float32/None) as aligned strings."""
    xs = list(xs)
    fmt = formatter(xs, digits, threshold)
    return [fmt(x) for x in xs]
