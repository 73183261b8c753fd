"""Multi-dimensional data layout: Z-order (Morton) clustering.

Sorting a table by interleaved bits of several columns co-locates rows
close in ALL those dimensions into the same files/row groups, so min/max
row-group stats prune scans filtered on ANY of the dimensions -- the same
technique behind Delta OPTIMIZE ZORDER BY. Pure expression code (bit
shifts), no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank_normalize(df: DataFrame, col: str, bits: int) -> Column:
    """Map a column to [0, 2^bits) by percent_rank -- Z-order needs bounded
    uniform-ish integer coordinates regardless of the value distribution."""
    from pyspark.sql import Window

    pr = F.percent_rank().over(Window.orderBy(F.col(col)))
    return F.least(
        F.floor(pr * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
    )


def zorder_key(coords: Sequence[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each coordinate into one Morton
    key (for k coords the key uses k*bits bits; keep k*bits <= 62)."""
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(coords):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * len(coords) + i))
    return key


def _quantile_normalize(df: DataFrame, col: str, bits: int) -> Column:
    """Map a column to [0, 2^bits) by approximate quantile bins: no global
    window (the scale path). The cut array is a broadcast literal; the
    coordinate is how many cuts lie at or below the value (vectorized
    filter/size over the literal array inside codegen)."""
    n_bins = 1 << bits
    probs = [i / n_bins for i in range(1, n_bins)]
    cuts = df.stat.approxQuantile(col, probs, 0.001)
    cut_arr = F.array(*[F.lit(float(c)) for c in cuts])
    x = F.col(col).cast("double")
    return F.size(F.filter(cut_arr, lambda c: c <= x)).cast("long")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    n_files: int = 8,
    mode: str = "quantile",
) -> None:
    """Write ``df`` Z-ordered on ``cols``: normalize each column to integer
    coordinates, Morton-interleave, range-partition by the key, sort inside
    files. Filters on any of ``cols`` then skip most row groups via parquet
    min/max stats.

    mode='quantile' (default): approxQuantile bins -- no global window, the
    100 TB path; keep bits <= 8 so the literal cut arrays stay small.
    mode='rank': exact percent_rank over an UNPARTITIONED window (single
    reduce task) -- small-data/debug only."""
    norm = _rank_normalize if mode == "rank" else _quantile_normalize
    coords = [norm(df, c, bits) for c in cols]
    keyed = df.withColumn("__z", zorder_key(coords, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
