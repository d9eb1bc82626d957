"""Portable hashing + tokenization expressions.

Engine-independent hashes are the backbone of oracle-checkable dedup: Spark's
``hash()`` (Murmur3) and DuckDB's ``hash()`` are different algorithms, so any
MinHash/SimHash built on them could never be verified across engines. Instead
we derive integer hashes from **md5 hex digests**, which both engines compute
identically:

    Spark : cast(conv(substr(md5(x), 1, 8), 16, 10) as bigint)
    DuckDB: ('0x' || substr(md5(x), 1, 8))::UBIGINT::BIGINT

Verified bit-equal across pyspark 4.1.2 and duckdb 1.0.0 (see
tests/test_hashing.py). md5 is used as a *mixer*, not for security.

At 100 TB scale the md5-per-token cost is real but embarrassingly parallel and
stays inside whole-stage codegen (built-in expressions, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Prime > 2^32 for MinHash universal-hash permutations.
MERSENNE_P = 4294967311


def portable_hash32(col: Column) -> Column:
    """First 32 bits of md5(x) as a non-negative bigint (0 .. 2^32-1)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def portable_hash32_sql(expr: str) -> str:
    """DuckDB mirror of :func:`portable_hash32`."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::UBIGINT)::BIGINT"


def portable_hash60(col: Column) -> Column:
    """First 60 bits of md5(x) as a non-negative bigint (fits signed 64)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::UBIGINT)::BIGINT"


def minhash_perm(h32: Column, a: int, b: int) -> Column:
    """One universal-hash permutation ``(a*h + b) mod P`` in plain 64-bit
    arithmetic: ``perm_constants`` keeps a < 2^31 and h < 2^32, so the product
    is < 2^63 — no overflow (ANSI mode would raise if this bound broke).
    Pure long ops stay in whole-stage codegen; the earlier decimal(38,0)
    variant was measured several times slower (BigDecimal per row)."""
    return (F.lit(a) * h32 + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_perm_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({a}::BIGINT * {h_expr}) + {b}) % {MERSENNE_P}"


def perm_constants(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k MinHash permutations via a fixed LCG —
    no RNG state, reproducible everywhere (embedded into both the Spark plan
    and the oracle SQL). a stays odd and < 2^31 so a*h fits signed 64-bit."""
    out = []
    x = seed
    for _ in range(k):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = 2 * (x % (1 << 30)) + 1  # odd, nonzero, < 2^31
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x
        out.append((a, b))
    return out


# ----------------------------------------------------------- tokenization
def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased text, empty tokens dropped.
    Chosen over ``\\W+`` because whitespace semantics agree across engines for
    non-Latin scripts (SURVEY-era gotcha: ASCII-only ``\\w`` would erase CJK).

    Separator CONTRACT (declared here, both engines): Java's ``\\s`` =
    ``[ \\t\\n\\x0B\\f\\r]`` — ASCII whitespace including vertical tab.
    The Spark side uses ``\\s+`` literally; the DuckDB mirror spells the
    SAME class out explicitly, because RE2's ``\\s`` is ``[ \\t\\n\\f\\r]``
    — it excludes VT, the one character the dialects disagree on (probed
    round 8; a VT-separated doc tokenized differently per engine before).
    Unicode spaces (NBSP, NEL, thin/ideographic space, ZWSP, LS/PS) are
    NOT separators in either engine — consistent, and relied on by the
    textfuzz edge variant. Pinned by
    tests/test_edge_inputs.py::test_whitespace_dialect_agreement.

    Known case-folding dialect boundary (probed, round 6): the JVM applies
    Unicode FULL case mapping — Turkish ``İ`` lowers to ``i`` + combining
    dot, capital sigma takes the contextual final form ``ς`` at word end —
    while DuckDB's ``lower()`` applies simple 1:1 mappings (``İ``→``i``,
    ``Σ``→``σ`` everywhere). The engines agree on every other script
    probed (fullwidth, Cherokee, Deseret, ligatures, digraphs). Pinned in
    tests/test_edge_inputs.py::test_case_folding_dialect_boundary so a
    change in either engine is noticed."""
    return F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda x: x != F.lit("")
    )


TOKENS_SQL = (
    "list_filter(regexp_split_to_array(lower(trim({expr})),"
    " '[ \\t\\n\\v\\f\\r]+'), x -> x != '')"
)


def tokens_sql(expr: str) -> str:
    """DuckDB mirror of :func:`tokens`."""
    return TOKENS_SQL.format(expr=expr)
