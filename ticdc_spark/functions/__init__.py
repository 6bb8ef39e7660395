"""Scalar / vectorized function library (SURVEY.md §2.9 analog).

All functions are pure Column expressions (JVM-side, whole-stage codegen) —
no per-row Python, per the north rule. Cross-engine determinism (the DuckDB
oracle must reproduce every value bit-for-bit) comes from md5-based hashing
(functions.hashing) instead of engine-private hash functions.
"""

from . import hashing, text  # noqa: F401
