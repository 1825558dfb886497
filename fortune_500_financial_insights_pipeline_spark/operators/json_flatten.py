"""JSON flattening with explicit schemas and defaults: the Spark-native form
of the reference's driver-side dict walking.

* Company info: 11 flat fields with ``""``/null defaults and the
  address1→address rename (/root/reference/code/scripts/
  transform_and_copy_to_landing_info.py:43-63).
* ESG sustainability: 31 fields from a 2-3-level nested document, taking
  ``.avg`` of the five peer-performance structs
  (transform_and_copy_to_landing_sustainability.py:43-98).

Explicit StructTypes (not schema inference) so that keys missing from every
file still materialize as null columns — inference would silently drop them,
and at 100 TB an inference pass is an extra full scan anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

INFO_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("shortName", T.StringType()),
        T.StructField("industry", T.StringType()),
        T.StructField("sector", T.StringType()),
        T.StructField("fullTimeEmployees", T.LongType()),
        T.StructField("totalRevenue", T.DoubleType()),
        T.StructField("address1", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("zip", T.StringType()),
        T.StructField("website", T.StringType()),
    ]
)

_PEER_STRUCT = T.StructType(
    [
        T.StructField("min", T.DoubleType()),
        T.StructField("avg", T.DoubleType()),
        T.StructField("max", T.DoubleType()),
    ]
)

ESG_BOOL_FIELDS = [
    "adult",
    "alcoholic",
    "animalTesting",
    "catholic",
    "coal",
    "controversialWeapons",
    "furLeather",
    "gambling",
    "militaryContract",
    "nuclear",
    "palmOil",
    "pesticides",
    "smallArms",
    "tobacco",
]

ESG_PEER_FIELDS = [
    "peerEnvironmentPerformance",
    "peerEsgScorePerformance",
    "peerGovernancePerformance",
    "peerSocialPerformance",
    "peerHighestControversyPerformance",
]

SUSTAINABILITY_SCHEMA = T.StructType(
    [
        T.StructField(
            "esgScores",
            T.StructType(
                [
                    T.StructField("totalEsg", T.DoubleType()),
                    T.StructField("environmentScore", T.DoubleType()),
                    T.StructField("socialScore", T.DoubleType()),
                    T.StructField("governanceScore", T.DoubleType()),
                    T.StructField("percentile", T.DoubleType()),
                    T.StructField("environmentPercentile", T.DoubleType()),
                    T.StructField("ratingYear", T.LongType()),
                    T.StructField("ratingMonth", T.LongType()),
                    T.StructField("maxAge", T.LongType()),
                    T.StructField("peerCount", T.LongType()),
                    T.StructField("esgPerformance", T.StringType()),
                    T.StructField("peerGroup", T.StringType()),
                    *[T.StructField(b, T.BooleanType()) for b in ESG_BOOL_FIELDS],
                    *[T.StructField(p, _PEER_STRUCT) for p in ESG_PEER_FIELDS],
                ]
            ),
        )
    ]
)


def _dflt(col: Column, dtype: str) -> Column:
    """Reference default semantics: missing string keys become ''."""
    if dtype == "string":
        return F.coalesce(col, F.lit(""))
    return col


def read_info_json(spark: SparkSession, path: str) -> DataFrame:
    """One JSON object per file (glob path = one scan, vs the reference's
    one Dataproc job per file, transform_json_INFO.py:61-95)."""
    return spark.read.schema(INFO_SCHEMA).json(path, multiLine=True)


def flatten_info(df: DataFrame) -> DataFrame:
    return df.select(
        _dflt(F.col("symbol"), "string").alias("symbol"),
        _dflt(F.col("shortName"), "string").alias("shortName"),
        _dflt(F.col("industry"), "string").alias("industry"),
        _dflt(F.col("sector"), "string").alias("sector"),
        F.col("fullTimeEmployees").alias("fullTimeEmployees"),
        F.col("totalRevenue").alias("totalRevenue"),
        _dflt(F.col("address1"), "string").alias("address"),
        _dflt(F.col("city"), "string").alias("city"),
        _dflt(F.col("state"), "string").alias("state"),
        _dflt(F.col("zip"), "string").alias("zip"),
        _dflt(F.col("website"), "string").alias("website"),
    )


def read_sustainability_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(SUSTAINABILITY_SCHEMA).json(path, multiLine=True)


def flatten_sustainability(df: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """esgScores nested doc → 31 flat columns (dotted-path extraction; a
    wholly-missing esgScores yields a row of nulls/defaults, mirroring
    ``data.get("esgScores", {})``). ``keep`` passes through extra columns
    (e.g. a filename-derived Ticker — the reference carries the ticker as a
    job argument per file, transform_json_SUSTAINABLITY.py:75)."""
    e = "esgScores"
    scalar_nums = [
        "totalEsg",
        "environmentScore",
        "socialScore",
        "governanceScore",
        "percentile",
        "environmentPercentile",
    ]
    scalar_ints = ["ratingYear", "ratingMonth", "maxAge", "peerCount"]
    cols: list[Column] = []
    cols += [F.col(f"{e}.{c}").alias(c) for c in scalar_nums]
    cols += [F.col(f"{e}.{c}").alias(c) for c in scalar_ints]
    cols += [
        _dflt(F.col(f"{e}.esgPerformance"), "string").alias("esgPerformance"),
        _dflt(F.col(f"{e}.peerGroup"), "string").alias("peerGroup"),
    ]
    cols += [F.col(f"{e}.{b}").alias(b) for b in ESG_BOOL_FIELDS]
    cols += [F.col(f"{e}.{p}.avg").alias(f"{p}_avg") for p in ESG_PEER_FIELDS]
    cols += [F.col(k) for k in (keep or [])]
    return df.select(*cols)
