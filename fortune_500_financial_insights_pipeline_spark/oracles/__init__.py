"""DuckDB oracle SQL, one entry per key in queries.QUERIES.

Column names/aliases match the Spark side exactly (the driver sorts columns
by name before hashing). Floating-point aggregates mirror the exact-decimal
interior (functions/deterministic.py) so values are bit-identical.
Integer aggregates are cast to BIGINT because DuckDB widens SUM(BIGINT) to
HUGEINT while Spark stays at long.

Round-3 split: entries live in file-order part modules under this
package; importing the package fills ORACLES in the original insertion
order. External import path unchanged:
`from fortune_500_financial_insights_pipeline_spark.oracles import ORACLES`.
"""

from fortune_500_financial_insights_pipeline_spark.oracles._core import ORACLES  # noqa: F401

from fortune_500_financial_insights_pipeline_spark.oracles import _part1  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.oracles import _part2  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.oracles import _part3  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.oracles import _part4  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.oracles import _part5  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.oracles import _part6  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.oracles import _part7  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.oracles import _part8  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.oracles import _part9  # noqa: F401,E402
