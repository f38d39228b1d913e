from mr_dice_spark.plans.builders import (
    EVENT_TYPES,
    PART_BRANDS,
    PART_TYPES,
    InvalidParam,
    ParametricQuery,
    bohrium_fetch,
    mofdb_fetch,
    openlam_fetch,
)

__all__ = [
    "EVENT_TYPES",
    "PART_BRANDS",
    "PART_TYPES",
    "InvalidParam",
    "ParametricQuery",
    "bohrium_fetch",
    "mofdb_fetch",
    "openlam_fetch",
]
