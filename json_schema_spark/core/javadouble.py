"""Java 17 ``Double.toString`` in pure Python.

The reference's entire number model rides on this string: Jackson
parses every JSON float literal to a ``double``, and the engine's
exact arithmetic runs on ``BigDecimal.valueOf(double)`` — which is
``new BigDecimal(Double.toString(d))``. JDK ≤ 18 renders doubles with
the original ``FloatingDecimal`` algorithm, which is NOT always the
shortest round-trip form: ``Double.toString(2^62)`` is
``4.6116860184273879E18`` (17 digits) where the shortest is
``4.611686018427388E18`` (16) — JDK-4511638, fixed only in JDK 19 by
the Ryū rewrite. Python's ``repr`` is shortest-form, so
``Decimal(repr(f))`` silently disagrees with the reference on that
tail: ``{"multipleOf": 3}`` ACCEPTS ``4.611686018427388e+18`` under
the reference (``...879E18`` digit-sums to 81) and rejected it under
the old kernel model. Caught by the fresh-seed expression-path sweep
(scripts/sweep_expr.py) as an expr↔kernel mismatch — the Spark side
(JVM double→decimal casts = ``BigDecimal.valueOf``) had the reference
semantics all along and the kernel was the divergent one.

This ports ``jdk.internal.math.FloatingDecimal`` digit development
(``BinaryToASCIIBuffer.dtoa`` + ``developLongDigits`` + ``roundup`` +
``toJavaFormatString``), recovered instruction-by-instruction from the
installed JDK 17's bytecode (``javap -c`` on java.base.jmod — no JDK
source ships in this container). Faithfulness requires reproducing
Java's THREE arithmetic tiers, because they are observably different:

* int tier (operand estimate < 32 bits) and long tier (< 64 bits)
  test the high boundary STRICTLY (``b + m > tens``) and, crucially,
  compute ``b + m`` and ``m *= 10`` in WRAPPING 32/64-bit arithmetic.
  The loop guards only ``m > 0`` — an overflow of ``b + m`` silently
  flips ``high`` to false and suppresses the final round-up (this is
  the actual mechanism behind Java 17 printing
  ``2.7241681988985244E25`` where the nearest 17-digit decimal ends
  ``...245``: ``b + m`` ≈ 9.33e18 wraps negative).
* FDBigInteger tier is exact but tests the high boundary INCLUSIVELY
  (``tenS.addAndCmp(B, M) <= 0``, i.e. ``b + m >= tens``).

Tables (``insignificantDigitsNumber``, ``N_5_BITS``) are copied from
the bytecode's static initializer verbatim. Verified against the live
JVM over ~10^6 structured + random bit patterns by
``tests/test_java_double_differential.py``.
"""

from __future__ import annotations

import math
import struct

__all__ = ["java17_double_repr"]

_EXP_SHIFT = 52
_FRACT_HOB = 1 << 52
_SIGNIF_MASK = (1 << 52) - 1
_EXP_BIAS = 1023
_MAX_SMALL_BIN_EXP = 62
_MIN_SMALL_BIN_EXP = -21
_LONG_5_POW_LEN = 27  # FDBigInteger.LONG_5_POW.length

# FloatingDecimal.insignificantDigitsNumber (bytecode <clinit>, len 64)
_INSIGNIFICANT_DIGITS = [
    0, 0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5, 5,
    6, 6, 6, 6, 7, 7, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11,
    12, 12, 12, 12, 13, 13, 13, 14, 14, 14, 15, 15, 15, 15, 16, 16, 16,
    17, 17, 17, 18, 18, 18, 19,
]

# FloatingDecimal.N_5_BITS (bytecode <clinit>, len 27): bits of 5^i
_N_5_BITS = [
    0, 3, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28, 31, 33, 35, 38,
    40, 42, 45, 47, 49, 52, 54, 56, 59, 61,
]

_I32 = 1 << 32
_I64 = 1 << 64


def _i32(x: int) -> int:
    x &= _I32 - 1
    return x - _I32 if x >= (_I32 >> 1) else x


def _i64(x: int) -> int:
    x &= _I64 - 1
    return x - _I64 if x >= (_I64 >> 1) else x


def _jdiv(a: int, b: int) -> int:
    """Java integer division: truncation toward zero."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _jrem(a: int, b: int) -> int:
    """Java %: remainder carries the dividend's sign."""
    return a - _jdiv(a, b) * b


def _insignificant_digits_for_pow2(p2: int) -> int:
    if 1 < p2 < 64:
        return _INSIGNIFICANT_DIGITS[p2]
    return 0


def _develop_long_digits(dec_exp: int, lvalue: int, insignificant: int):
    """developLongDigits: drop the provably insignificant low digits
    (rounding half-up on the discarded residue), then emit the
    remaining digits with trailing zeros stripped."""
    if insignificant != 0:
        pow10 = 10 ** insignificant
        lvalue, residue = divmod(lvalue, pow10)
        dec_exp += insignificant
        if residue >= (pow10 >> 1):
            lvalue += 1
    s = str(lvalue)
    stripped = s.rstrip("0") or "0"
    return [int(c) for c in stripped], dec_exp + len(s)


def _estimate_dec_exp(fract: int, bin_exp: int) -> int:
    d2 = struct.unpack(
        ">d", struct.pack(">q", (_EXP_BIAS << _EXP_SHIFT)
                          | (fract & _SIGNIF_MASK)))[0]
    # same double expression, same association order as estimateDecExp;
    # the bytecode then floors via bit twiddling == math.floor
    d = (d2 - 1.5) * 0.289529654 + 0.176091259 \
        + bin_exp * 0.301029995663981
    return math.floor(d)


def _roundup(digits: list[int], dec_exp: int) -> int:
    i = len(digits) - 1
    if digits[i] == 9:
        while digits[i] == 9 and i > 0:
            digits[i] = 0
            i -= 1
        if digits[i] == 9:
            # carry out of the first digit: high-order 1, zero tail
            # kept, exponent bumps (FloatingDecimal.roundup)
            digits[0] = 1
            return dec_exp + 1
    digits[i] += 1
    return dec_exp


def _dtoa(bin_exp: int, fract: int, n_significant: int):
    """Returns (digits list, dec_exponent): value = 0.<digits> *
    10^dec_exponent. Positive finite input, hidden bit set."""
    tail_zeros = (fract & -fract).bit_length() - 1
    n_fract_bits = _EXP_SHIFT + 1 - tail_zeros
    n_tiny_bits = max(0, n_fract_bits - bin_exp - 1)

    if (_MIN_SMALL_BIN_EXP <= bin_exp <= _MAX_SMALL_BIN_EXP
            and n_tiny_bits < _LONG_5_POW_LEN
            and n_fract_bits + _N_5_BITS[n_tiny_bits] < 64
            and n_tiny_bits == 0):
        # integral long value: exact digits minus the insignificant
        # tail — the source of the non-shortest outputs; no shortest
        # re-check happens here
        if bin_exp > n_significant:
            insignificant = _insignificant_digits_for_pow2(
                bin_exp - n_significant - 1)
        else:
            insignificant = 0
        if bin_exp >= _EXP_SHIFT:
            lvalue = fract << (bin_exp - _EXP_SHIFT)
        else:
            lvalue = fract >> (_EXP_SHIFT - bin_exp)
        return _develop_long_digits(0, lvalue, insignificant)

    dec_exp = _estimate_dec_exp(fract, bin_exp)

    b5 = max(0, -dec_exp)
    b2 = b5 + n_tiny_bits + bin_exp
    s5 = max(0, dec_exp)
    s2 = s5 + n_tiny_bits
    m5 = b5
    m2 = b2 - n_significant

    fract >>= tail_zeros
    b2 -= n_fract_bits - 1
    common2 = min(b2, s2)
    b2 -= common2
    s2 -= common2
    m2 -= common2

    # ulp asymmetry hack at exact powers of two
    if n_fract_bits == 1:
        m2 -= 1
    if m2 < 0:
        b2 -= m2
        s2 -= m2
        m2 = 0

    # arithmetic-tier selection, exactly as the bytecode estimates it
    b_bits = n_fract_bits + b2 \
        + (_N_5_BITS[b5] if b5 < len(_N_5_BITS) else b5 * 3)
    ten_s_bits = s2 + 1 \
        + (_N_5_BITS[s5 + 1] if s5 + 1 < len(_N_5_BITS) else (s5 + 1) * 3)

    digits: list[int] = []
    if b_bits < 64 and ten_s_bits < 64:
        # int (<32) / long (<64) tier: identical logic, different
        # wrapping width; strict high test; m>0 loop guard; every
        # arithmetic op wraps silently at the tier width (b+m, m*10,
        # and the final (b<<1)-tens — each wrap is observable in the
        # rendered digits)
        wrap = _i32 if (b_bits < 32 and ten_s_bits < 32) else _i64
        b = wrap(wrap(fract * (5 ** b5)) << b2)
        s = wrap((5 ** s5) << s2)
        m = wrap((5 ** m5) << m2)
        tens = wrap(s * 10)
        q = _jdiv(b, s)
        b = wrap(10 * _jrem(b, s))
        m = wrap(m * 10)
        low = b < m
        high = wrap(b + m) > tens
        if q == 0 and not high:
            dec_exp -= 1
        else:
            digits.append(q)
        if dec_exp < -3 or dec_exp >= 8:
            high = low = False
        while not low and not high:
            q = _jdiv(b, s)
            b = wrap(10 * _jrem(b, s))
            m = wrap(m * 10)
            if m > 0:
                low = b < m
                high = wrap(b + m) > tens
            else:
                # m overflowed: certainly > b and b+m "overflowed too"
                low = True
                high = True
            digits.append(q)
        low_digit_difference = wrap(wrap(b << 1) - tens)
    else:
        b = fract * (5 ** b5) << b2
        s = (5 ** s5) << s2
        m = (5 ** m5) << m2
        tens = s * 10
        # FDBigInteger tier: exact arithmetic, INCLUSIVE high test
        q, r = divmod(b, s)
        b = 10 * r
        m *= 10
        low = b < m
        high = b + m >= tens
        if q == 0 and not high:
            dec_exp -= 1
        else:
            digits.append(q)
        if dec_exp < -3 or dec_exp >= 8:
            high = low = False
        while not low and not high:
            q, r = divmod(b, s)
            b = 10 * r
            m *= 10
            low = b < m
            high = b + m >= tens
            digits.append(q)
        if high and low:
            b <<= 1
            low_digit_difference = (b > tens) - (b < tens)  # cmp sign
        else:
            low_digit_difference = 0

    dec_exp += 1
    if high:
        if low:
            if low_digit_difference == 0:
                if digits[-1] & 1:
                    dec_exp = _roundup(digits, dec_exp - 1) + 1
            elif low_digit_difference > 0:
                dec_exp = _roundup(digits, dec_exp - 1) + 1
        else:
            dec_exp = _roundup(digits, dec_exp - 1) + 1
    return digits, dec_exp


def _format(digits: list[int], dec_exp: int, negative: bool) -> str:
    """toJavaFormatString layout rules."""
    sign = "-" if negative else ""
    ds = "".join(str(d) for d in digits)
    n = len(ds)
    if 0 < dec_exp < 8:
        if dec_exp >= n:
            return f"{sign}{ds}{'0' * (dec_exp - n)}.0"
        return f"{sign}{ds[:dec_exp]}.{ds[dec_exp:]}"
    if -3 < dec_exp <= 0:
        return f"{sign}0.{'0' * (-dec_exp)}{ds}"
    mantissa = ds[0] + "." + (ds[1:] or "0")
    return f"{sign}{mantissa}E{dec_exp - 1}"


def java17_double_repr(d: float) -> str:
    """``Double.toString(d)`` exactly as JDK 17 (pre-Ryū) renders it."""
    if d != d:
        return "NaN"
    if d == math.inf:
        return "Infinity"
    if d == -math.inf:
        return "-Infinity"
    bits = struct.unpack(">Q", struct.pack(">d", d))[0]
    negative = bool(bits >> 63)
    raw_exp = (bits >> 52) & 0x7FF
    fract = bits & _SIGNIF_MASK
    if raw_exp == 0:
        if fract == 0:
            return "-0.0" if negative else "0.0"
        # subnormal: normalize so the high-order bit sits at bit 52
        lead = 52 - fract.bit_length() + 1
        fract <<= lead
        bin_exp = -1022 - lead
        n_significant = _EXP_SHIFT + 1 - lead
    else:
        fract |= _FRACT_HOB
        bin_exp = raw_exp - _EXP_BIAS
        n_significant = _EXP_SHIFT + 1
    digits, dec_exp = _dtoa(bin_exp, fract, n_significant)
    return _format(digits, dec_exp, negative)
