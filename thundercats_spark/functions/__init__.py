from thundercats_spark.functions import text_analysis, vectors

__all__ = ["text_analysis", "vectors"]
