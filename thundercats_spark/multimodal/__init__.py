from thundercats_spark.multimodal import binary

__all__ = ["binary"]
