"""thundercats_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of
tao-pr/thundercats (functional-style Spark library; see
/root/reference/API.md): MayFail-monadic physical IO + relational
operators + an ML layer, extended with LLM-training-data operators
(dedup, similarity search, multimodal columns, text analysis) designed
for 100 TB scale.

Everything is declarative DataFrame API so Catalyst handles pushdown,
pruning, join strategy and AQE handles skew/coalesce at runtime.
"""

from thundercats_spark.functional.maybe import MayFail, Ok, Fail, IgnorableFail

__version__ = "0.1.0"

__all__ = ["MayFail", "Ok", "Fail", "IgnorableFail", "__version__"]
