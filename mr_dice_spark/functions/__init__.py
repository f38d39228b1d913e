from mr_dice_spark.functions.formula import (
    anonymous_formula,
    hill_formula,
    normalize_unicode_digits,
    normalize_unicode_digits_col,
    parse_formula,
)
from mr_dice_spark.functions.spacegroup import HM_SYMBOLS, spacegroup_symbol
from mr_dice_spark.functions.text import (
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)

__all__ = [
    "anonymous_formula",
    "hill_formula",
    "normalize_unicode_digits",
    "normalize_unicode_digits_col",
    "parse_formula",
    "HM_SYMBOLS",
    "spacegroup_symbol",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count",
    "tokens",
]
