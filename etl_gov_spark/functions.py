"""Public column-function facade (the engine's reusable expression
vocabulary).

Everything here is a *Column builder*: pure, JVM-codegen expressions
(or plan transforms) you compose into your own DataFrame pipelines —
the same primitives the built-in operators are made of. Importing
from this module is the supported surface; the operators' private
helpers may move.

    from etl_gov_spark import functions as EF
    docs.select(EF.tokens("text"), EF.shingles())
    emb.select(EF.cosine("a", "b"))
    orders.select(EF.uniform_draw("o_orderkey"))
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import expand_parallelism  # noqa: F401  (re-export)
from etl_gov_spark.operators.dedup import (  # noqa: F401  (re-export)
    pair_structs,
    shingles_col,
)
from etl_gov_spark.operators.similarity import _dot, _norm
from etl_gov_spark.operators.text import tokens_col


def tokens(text: str = "text") -> Column:
    """Whitespace tokens of a trimmed text column (codegen)."""
    return tokens_col(text)


def shingles(k: int = 3, toks: Column | str = "toks") -> Column:
    """Word k-gram shingles of a MATERIALIZED token-array column.
    (Materialize first — higher-order lambdas are not CSE'd.)"""
    return shingles_col(k, toks)


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<double> columns (codegen fold)."""
    return _dot(a, b)


def l2_norm(a: Column | str) -> Column:
    """L2 norm of an array<double> column (codegen fold)."""
    return _norm(a)


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<double> columns. For repeated
    scoring, precompute ``l2_norm`` per side once instead (one fold
    per pair, not three — see ann_bruteforce_topk)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def uniform_draw(key: Column | str, salt: str = "") -> Column:
    """Portable deterministic uniform draw in (0, 1] from a key
    column: first 48 bits of md5(salt || key) — identical on every
    executor, every rerun, and in DuckDB (the engine's sampling /
    splitting primitive)."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.substring(F.md5(F.concat(F.lit(salt), k.cast("string"))), 1, 12)
    return (F.conv(h, 16, 10).cast("double") + F.lit(1.0)) / F.lit(float(1 << 48))


def minhash_band_keys(sig_cols: list[str], n_bands: int) -> Column:
    """LSH band keys from minhash signature columns: band-prefixed
    concatenations, exploded by the caller into the bucket join.
    len(sig_cols) must divide evenly into n_bands — silently
    dropping trailing signature columns would weaken recall with no
    signal to the caller."""
    if not sig_cols or n_bands <= 0 or len(sig_cols) % n_bands != 0:
        raise ValueError(
            f"len(sig_cols)={len(sig_cols)} must be a positive multiple of "
            f"n_bands={n_bands}"
        )
    per_band = len(sig_cols) // n_bands
    bands = []
    for b in range(n_bands):
        parts = [F.lit(f"{b}:")] + [
            F.col(c) for c in sig_cols[b * per_band : (b + 1) * per_band]
        ]
        bands.append(F.concat(*parts))
    return F.array(*bands)


def zscore(value: Column | str, mean: Column | str, std: Column | str) -> Column:
    """Standard score; NULL-safe on zero std."""
    v = F.col(value) if isinstance(value, str) else value
    m = F.col(mean) if isinstance(mean, str) else mean
    s = F.col(std) if isinstance(std, str) else std
    return F.when(s != 0, (v - m) / s)


def widen(df: DataFrame) -> DataFrame:
    """Repartition up to cluster parallelism before CPU-heavy
    expansion stages (see io.sources.expand_parallelism)."""
    return expand_parallelism(df)
