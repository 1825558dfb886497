"""Fixture query registry: one PySpark callable per operator from SURVEY.md §2.

Each callable takes ``(spark, sf_dir)`` and returns a DataFrame. Every
computed column is aliased to the exact name the matching oracle SQL uses
(fortune_500_financial_insights_pipeline_spark/oracles.py) so the driver's column-sorted value-hash
lines up. Floating-point aggregates use the exact-decimal interior from
functions/deterministic.py so results are bit-identical to the single-threaded
DuckDB oracle regardless of partitioning.

Reference parity notes cite /root/reference files as file:line.

Round-3 split: the registry now lives in domain modules under this
package; importing the package registers every query in the original
order. External import path is unchanged:
`from fortune_500_financial_insights_pipeline_spark.queries import QUERIES`.
"""

from fortune_500_financial_insights_pipeline_spark.queries._core import QUERIES, q  # noqa: F401

from fortune_500_financial_insights_pipeline_spark.queries import _relational  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _temporal  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _text  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _multimodal  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _sql_text  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _analytics  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _retrieval  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _extensions_a  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _extensions_b  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _extensions_c  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _extensions_d  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _extensions_e  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _extensions_f  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _extensions_g  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _extensions_h  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _extensions_i  # noqa: F401,E402
from fortune_500_financial_insights_pipeline_spark.queries import _extensions_j  # noqa: F401,E402
