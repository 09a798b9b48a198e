"""Scalar expression kits shared across operators."""

from pyspark.sql import Column
from pyspark.sql import functions as F


def knuth_mod32(key: Column, mult: int) -> Column:
    """(key · mult) mod 2³² — the engine-neutral Knuth multiplicative
    hash — computed WITHOUT int64 overflow: the multiply runs in
    DECIMAL(38,0) (exact; key·mult reaches ~2.4e19 > 2⁶³−1 once keys
    pass ~3.5e9 — the round-11 sf1.0-tiling find, caught as an ANSI
    ARITHMETIC_OVERFLOW at 10x scale), then reduces mod 2³² and
    returns a non-negative BIGINT. Bit-identical to the former plain
    int64 path wherever that path didn't overflow, so every pinned
    hash at sf ≤ 0.3 is unchanged. Oracle mirror:
    ``(CAST(key AS HUGEINT) * mult) % 4294967296``."""
    prod = key.cast("decimal(38,0)") * F.lit(mult)
    return F.pmod(prod, F.lit(4294967296)).cast("long")
