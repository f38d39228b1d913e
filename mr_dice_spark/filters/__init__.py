from mr_dice_spark.filters.optimade import (
    FilterSyntaxError,
    compile_filter,
    parse_filter,
)

__all__ = ["FilterSyntaxError", "compile_filter", "parse_filter"]
