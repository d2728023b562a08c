from thundercats_spark.preprocess import text

__all__ = ["text"]
