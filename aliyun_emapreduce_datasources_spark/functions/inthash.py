"""ANSI-safe 64-bit integer-hash expression helpers.

The portable-md5 dedup family (MinHash OPH, SimHash) computes 64-bit
hash arithmetic per document. Round 9 ran those signature stages in
``mapInPandas``; this module provides the same primitives as JVM
expression trees so the whole signature leg stays inside whole-stage
codegen (round-9 verdict ask #3 — the python-worker leg was the
container-coupled 2-3x wall-clock swing between rounds).

The subtlety is ANSI mode (default-on in Spark 4, and what the
driver's vanilla session runs): ``+`` and ``*`` raise on int64
overflow instead of wrapping, but the MinHash densification filler is
DEFINED by numpy's wrapping int64 multiply (dedup/minhash.py
``_FILL_C1``). Bitwise ops (``&``, ``|``, ``^``, ``shiftleft``,
``shiftrightunsigned``) are exempt from ANSI checks, so wrap-add and
wrap-multiply are rebuilt here from 32/16-bit limbs whose partial
products provably fit in a signed 64-bit lane:

- ``wadd``: split both operands at bit 32; low-lane sum < 2^33, high
  lane (two 32-bit halves + carry) < 3*2^32; recombine with a
  bit-truncating shiftleft.
- ``wmul_const``: schoolbook 32x32 with the constant's halves split
  again at bit 16 so every partial product is < 2^48.

All helpers treat a BIGINT column as its two's-complement bit pattern
(the unsigned value mod 2^64), matching both numpy int64 wrap
semantics and the DuckDB oracles' HUGEINT emulation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["h64_md5", "wadd", "wmul_const"]

_M32 = (1 << 32) - 1
_M16 = (1 << 16) - 1


def h64_md5(c: Column) -> Column:
    """Signed 64-bit value named by the first 16 md5 hex chars of a
    string column — the engine-portable hash family ('0x' ||
    substr(md5(s), 1, 16) cast through UBIGINT in DuckDB,
    ``_h64_md5``/``_signed64`` in the Python reference path).
    ``conv(..., 16, -10)`` interprets the 64-bit pattern as signed
    two's complement, so the BIGINT cast is exact for all 2^64
    values."""
    return F.conv(F.substring(F.md5(c), 1, 16), 16, -10).cast("long")


def wadd(a: Column, b: Column) -> Column:
    """(a + b) mod 2^64 on BIGINT bit patterns, never raising under
    ANSI: both 32-bit lanes stay far below the signed-64 ceiling and
    the final shiftleft truncates the carry out of bit 63."""
    lo = a.bitwiseAND(F.lit(_M32)) + b.bitwiseAND(F.lit(_M32))
    hi = (
        F.shiftrightunsigned(a, 32)
        + F.shiftrightunsigned(b, 32)
        + F.shiftrightunsigned(lo, 32)
    )
    return F.shiftleft(hi, 32).bitwiseOR(lo.bitwiseAND(F.lit(_M32)))


def _mul_u32_const(a32: Column, c32: int) -> Column:
    """a32 * c32 mod 2^64 where a32 holds a value in [0, 2^32) and c32
    is a Python constant in [0, 2^32). The constant splits at bit 16
    so each partial product is < 2^48 (no ANSI overflow); the high
    partial's shiftleft(16) wraps bits past 63 away, exactly mod
    2^64."""
    p_lo = a32 * F.lit(c32 & _M16)
    p_hi = F.shiftleft(a32 * F.lit(c32 >> 16), 16)
    return wadd(p_lo, p_hi)


def wmul_const(a: Column, c: int) -> Column:
    """(a * c) mod 2^64 on the BIGINT bit pattern of ``a`` and a
    Python int constant ``c`` (any sign; reduced mod 2^64) — numpy
    int64 wrap-multiply semantics, ANSI-safe. Schoolbook 32x32: the
    cross terms only contribute their low 32 bits after the final
    shiftleft(32)."""
    c %= 1 << 64
    a_lo = a.bitwiseAND(F.lit(_M32))
    a_hi = F.shiftrightunsigned(a, 32)
    low = _mul_u32_const(a_lo, c & _M32)
    mid = wadd(_mul_u32_const(a_lo, c >> 32), _mul_u32_const(a_hi, c & _M32))
    return wadd(low, F.shiftleft(mid, 32))
