from thundercats_spark.physical import io, ops
from thundercats_spark.physical.io import Read, Screen, Write
from thundercats_spark.physical.ops import (
    Agg,
    F_,
    Filter,
    Group,
    Join,
    Optimise,
    Order,
    Transform,
)

__all__ = [
    "io",
    "ops",
    "Read",
    "Write",
    "Screen",
    "Join",
    "Group",
    "Filter",
    "Order",
    "F_",
    "Agg",
    "Optimise",
    "Transform",
]
