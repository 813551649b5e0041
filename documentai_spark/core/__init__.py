"""Pure-Python semantic core ("the oracle").

No Spark, no third-party imports — these modules define the exact
byte-level semantics of extraction and scoring. The pandas UDFs in
``documentai_spark.operators`` call these same functions, so the pytest
oracle-equality tests pin the pipeline output byte-for-byte
(SURVEY.md §7.4 risk #1).
"""

from documentai_spark.core.extract import Span, extract_turn  # noqa: F401
from documentai_spark.core.textkind import detect_kind  # noqa: F401
