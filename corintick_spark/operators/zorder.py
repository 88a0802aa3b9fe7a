"""Z-order (Morton) clustering for multi-dimensional scan pruning.

Parquet prunes row groups / files by per-column min-max statistics, which
only helps when the data is clustered on the filtered column. Sorting by
one column destroys locality on every other; interleaving the bits of
several columns (a Morton / Z-curve key) keeps *each* dimension's min-max
ranges narrow, so a 100 TB store filtered by `uid` OR by time still skips
most files. This is the layout technique behind Delta/Iceberg OPTIMIZE
ZORDER BY — reimplemented here as pure Catalyst expressions (shift/and/or
in whole-stage codegen; no UDF, no driver loop over data).

Usage: `zorder_write(df, path, ["user_id", "ts"])` (plain column names —
timestamp columns are converted to epoch micros automatically) or
`TickStore.compact(zorder_by=[...])`.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton key: bit b of column i lands at position b*len(cols)+i.

    Inputs must already be non-negative ints < 2**bits (see
    ``quantize``). With n*bits <= 63 the key fits a bigint.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed bigint")
    terms = [
        F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def quantize(col: Column, mn: Column, mx: Column, bits: int = 16) -> Column:
    """Scale a numeric column to [0, 2**bits) given its min/max.

    min/max are Columns (typically from a broadcast 1-row aggregate) so the
    whole quantize+interleave+write is one distributed plan — no driver
    collect of data statistics.
    """
    buckets = F.lit((1 << bits) - 1)
    span = (mx.cast("double") - mn.cast("double"))
    frac = F.when(span > 0, (col.cast("double") - mn.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.least(F.floor(frac * (1 << bits)).cast("bigint"), buckets.cast("bigint"))


def with_zvalue(
    df: DataFrame, zcols: list[str], bits: int = 16, out: str = "_zvalue"
) -> DataFrame:
    """Append the Morton key for `zcols` (numeric/timestamp columns).

    Column ranges come from one tiny min/max aggregate broadcast-joined
    back (BroadcastNestedLoopJoin over exactly one row — free), keeping
    everything in a single plan.
    """
    dtypes = dict(df.dtypes)
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double", "date"}
    for c in zcols:
        dt = dtypes.get(c)
        if dt is None:
            raise ValueError(f"zorder column {c!r} not found; have {sorted(dtypes)}")
        if (
            dt not in ("timestamp", "timestamp_ntz")
            and dt not in numeric
            and not dt.startswith("decimal")
        ):
            # fail up front: under ANSI mode a string column would otherwise
            # throw CAST_INVALID_INPUT mid-job from quantize()
            raise ValueError(
                f"zorder column {c!r} has non-numeric type {dt}; "
                "z-ordering needs numeric/timestamp/date columns"
            )

    def as_num(c: str) -> Column:
        dt = dtypes.get(c)
        if dt in ("timestamp", "timestamp_ntz"):
            # NTZ → TZ cast is instant-exact under the session's UTC timeZone
            return F.unix_micros(F.col(c).cast("timestamp"))
        if dt == "date":
            return F.unix_date(F.col(c))
        return F.col(c)

    stats = df.agg(
        *[
            agg(as_num(c)).alias(f"_{nm}_{c}")
            for c in zcols
            for nm, agg in (("mn", F.min), ("mx", F.max))
        ]
    )
    joined = df.join(F.broadcast(stats))
    quantized = [
        quantize(as_num(c), F.col(f"_mn_{c}"), F.col(f"_mx_{c}"), bits)
        for c in zcols
    ]
    return joined.withColumn(out, interleave_bits(quantized, bits)).drop(
        *[f"_{nm}_{c}" for c in zcols for nm in ("mn", "mx")]
    )


def zorder_write(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    **writer_opts,
) -> None:
    """Write `df` as parquet clustered on the Z-curve of `zcols`.

    repartitionByRange on the Morton key gives globally disjoint key
    ranges per file (range exchange samples the key — one extra pass, the
    standard cost of OPTIMIZE); sortWithinPartitions tightens row-group
    stats inside each file.
    """
    z = with_zvalue(df, zcols, bits)
    if num_files:
        z = z.repartitionByRange(num_files, "_zvalue")
    else:
        z = z.repartitionByRange("_zvalue")
    (
        z.sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode("overwrite")
        .options(**writer_opts)
        .parquet(path)
    )
