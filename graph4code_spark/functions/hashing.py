"""Shared overflow-safe 32-bit multiplicative hash.

One definition of the Knuth-style ``(k · mult) mod 2^32`` used by both
the packing shuffle key (`operators/packing.py`) and the CMS/KMV
sketches (`operators/sketch.py`), so the overflow discipline cannot
drift between them (ADVICE r4).

A direct ``k * 2654435761`` overflows int64 for k ≥ ~3.47e9 — Spark
wraps silently while other engines promote or error (ADVICE r3), so the
advertised cross-engine determinism would break exactly at the 10^12-id
scale this targets.  The multiplicand is split into 16-bit halves with
a mod-2^32 reduction between steps: every intermediate stays below
2^49, and the oracle computes the same value exactly via HUGEINT.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column

#: Knuth's multiplicative hash constant (2^32 / phi); applied mod 2^32
#: it is a bijection on [0, 2^32), i.e. a deterministic permutation.
KNUTH = 2654435761
M32 = 2**32


def mulmod32(k: Column, mult: int = KNUTH) -> Column:
    """(k · mult) mod 2^32 without int64 overflow, for any long ``k``
    (reduced to [0, 2^32) first; ``pmod`` keeps negatives well-defined)."""
    k32 = F.pmod(k.cast("long"), F.lit(M32))
    hi = F.floor(k32 / F.lit(65536)).cast("long")
    lo = k32 % F.lit(65536)
    return (
        (hi * F.lit(mult)) % F.lit(M32) * F.lit(65536) + lo * F.lit(mult)
    ) % F.lit(M32)
