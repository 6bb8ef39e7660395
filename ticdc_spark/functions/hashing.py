"""Deterministic cross-engine hashing (SURVEY.md §2.9: PositionInertia hash
analog, pkg/hash used by cdc/sink/dispatcher/index_value.go:33-53).

The reference dispatches rows to sink partitions with its own stable hash so
that per-key ordering survives fan-out; we need the same property PLUS
cross-engine reproducibility (the DuckDB correctness oracle recomputes every
hash). `xxhash64`/`hash` are engine-private, so the portable primitives here
are built on md5, which both Spark and DuckDB expose with identical output:

    h60(x)  = int(md5(x)[0:15], 16)          -- 60-bit uniform hash
    perm_i(h) = (a_i * (h % P) + b_i) % P     -- universal-hash family, P=2^31-1

Engine-internal paths (bucket routing in lake/table.py) keep using xxhash64 —
it's faster and never crosses engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: perm multiplications stay < 2^62 (no int64 overflow).
MERSENNE_P = 2_147_483_647


def h60(col: Column | str) -> Column:
    """60-bit deterministic hash of a string column, identical in DuckDB as
    ``cast(concat('0x', substr(md5(x),1,15)) as bigint)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """The DuckDB-side rendering of :func:`h60` (oracle parity)."""
    return f"cast(concat('0x', substr(md5({expr}), 1, 15)) as bigint)"


def perm_params(i: int) -> tuple[int, int]:
    """(a, b) for the i-th universal-hash permutation; a odd, both < P."""
    a = (2 * i + 1) % MERSENNE_P
    b = (97 + 7919 * i) % MERSENNE_P
    return a, b


def perm(h: Column, i: int) -> Column:
    """i-th permutation of a 60-bit hash, in [0, P)."""
    a, b = perm_params(i)
    return (F.lit(a) * (h % F.lit(MERSENNE_P)) + F.lit(b)) % F.lit(MERSENNE_P)


def perm_sql(hexpr: str, i: int) -> str:
    a, b = perm_params(i)
    return f"(({a} * (({hexpr}) % {MERSENNE_P}) + {b}) % {MERSENNE_P})"


def bucket(col: Column | str, n: int) -> Column:
    """Stable dispatch bucket — hash(key) % n (index_value.go:33-53 analog),
    reproducible in DuckDB via :func:`bucket_sql`."""
    return h60(col) % F.lit(n)


def bucket_sql(expr: str, n: int) -> str:
    return f"({h60_sql(expr)} % {n})"
