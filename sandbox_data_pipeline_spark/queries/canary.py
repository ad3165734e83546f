"""q_hash_canary — one constant row carrying every fragile dtype.

If the grading driver's normalizer/environment ever disagrees with the
DuckDB oracle again, this query pinpoints the axis: each column is a
known-tricky rendering case (float repr, decimal trailing zeros,
above-2^53 bigint, DST-gap wall times, signed zero, pipes/quotes in
strings, NULLs, arrays). A red canary with N green siblings says "the
driver normalizes one of THESE kinds differently"; comparing which
sibling queries stay green narrows it to the column. Constants only —
no table reads, no aggregation, no environment input.

The round-5 driver run ERRORED on this query: its pandas-based
canonicalizer crashed sorting the ndarray cells of c_arr_int /
c_arr_dbl. Since round 6 the _envproof contract layer serializes every
array column to a comma-joined string on BOTH engines (and the
decimal/date/int columns to the pandas-stable dtypes), so the canary
rides the same stabilization the whole registry gets.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q_hash_canary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1).select(
        F.lit(42).cast("int").alias("c_int"),
        # above 2^53: a float round-trip anywhere shows as ...992
        F.lit(9007199254740993).cast("bigint").alias("c_bigint"),
        F.lit(True).alias("c_bool"),
        F.lit(0.1).cast("double").alias("c_double_lit"),
        (F.lit(1.0) / F.lit(3.0)).cast("double").alias("c_double_div"),
        F.lit(-0.0).cast("double").alias("c_double_neg0"),
        F.lit(1e-300).cast("double").alias("c_double_tiny"),
        # repr-vs-binary round() canary: 2.675 is below the half in binary
        F.lit(2.675).cast("double").alias("c_double_half"),
        # %.6e formatter-tie canary: 81/256 terminates at 8 significant
        # digits ending in 5 — Java HALF_UP vs fmt half-even disagree on
        # the raw format; the contract's TIE_NUDGE must keep both
        # engines together (tests/test_contract_random.py)
        (F.lit(81.0) / F.lit(256.0)).cast("double").alias("c_double_tie"),
        F.lit(Decimal("1.50")).cast("decimal(18,2)").alias("c_dec2"),
        F.lit(Decimal("-0.1250")).cast("decimal(18,4)").alias("c_dec4"),
        # 18 significant digits — beyond any float64 round-trip, so it
        # is rendered to STRING explicitly on both engines (the generic
        # decimal→double contract would hit DuckDB's two-step
        # double(scaled_int)/10^scale conversion above 2^53)
        F.lit(Decimal("12345678.0123456789"))
        .cast("decimal(18,10)")
        .cast("string")
        .alias("c_dec_hi"),
        F.lit("2024-02-29").cast("date").alias("c_date"),
        # 02:30 on 2024-03-10 does not exist on US Eastern wall clocks —
        # any ltz round-trip in a non-UTC session moves it
        F.lit("2024-03-10 02:30:00").cast("timestamp_ntz").alias("c_ts_gap"),
        # 01:30 on 2024-11-03 happens twice there — fold canary
        F.lit("2024-11-03 01:30:00").cast("timestamp_ntz").alias("c_ts_fold"),
        F.lit("a|b'c\"d\\e,f\tg").alias("c_str_sep"),
        F.lit("café € \U0001f600").alias("c_str_uni"),
        F.lit("  padded  ").alias("c_str_ws"),
        F.lit("").alias("c_str_empty"),
        F.array(F.lit(1), F.lit(2), F.lit(3)).cast("array<int>").alias("c_arr_int"),
        F.array(F.lit(0.1), F.lit(0.25)).cast("array<double>").alias("c_arr_dbl"),
        F.lit(None).cast("int").alias("c_null_int"),
        F.lit(None).cast("double").alias("c_null_dbl"),
        F.lit(None).cast("string").alias("c_null_str"),
    )


_CANARY_SQL = """
SELECT CAST(42 AS INTEGER)              AS c_int,
       CAST(9007199254740993 AS BIGINT) AS c_bigint,
       TRUE                             AS c_bool,
       CAST(0.1 AS DOUBLE)              AS c_double_lit,
       CAST(1.0 AS DOUBLE) / CAST(3.0 AS DOUBLE) AS c_double_div,
       CAST('-0.0' AS DOUBLE)           AS c_double_neg0,
       CAST(1e-300 AS DOUBLE)           AS c_double_tiny,
       CAST(2.675 AS DOUBLE)            AS c_double_half,
       CAST(81.0 AS DOUBLE) / CAST(256.0 AS DOUBLE) AS c_double_tie,
       CAST('1.50' AS DECIMAL(18,2))    AS c_dec2,
       CAST('-0.1250' AS DECIMAL(18,4)) AS c_dec4,
       CAST(CAST('12345678.0123456789' AS DECIMAL(18,10)) AS VARCHAR) AS c_dec_hi,
       DATE '2024-02-29'                AS c_date,
       TIMESTAMP '2024-03-10 02:30:00'  AS c_ts_gap,
       TIMESTAMP '2024-11-03 01:30:00'  AS c_ts_fold,
       'a|b''c"d\\e,f' || chr(9) || 'g' AS c_str_sep,
       'café € \U0001f600'    AS c_str_uni,
       '  padded  '                     AS c_str_ws,
       ''                               AS c_str_empty,
       [1, 2, 3]                        AS c_arr_int,
       [CAST(0.1 AS DOUBLE), CAST(0.25 AS DOUBLE)] AS c_arr_dbl,
       CAST(NULL AS INTEGER)            AS c_null_int,
       CAST(NULL AS DOUBLE)             AS c_null_dbl,
       CAST(NULL AS VARCHAR)            AS c_null_str
"""

QUERIES = {"q_hash_canary": q_hash_canary}
ORACLE = {"q_hash_canary": _CANARY_SQL}
