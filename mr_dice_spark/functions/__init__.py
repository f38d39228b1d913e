from mr_dice_spark.functions.formula import (
    anonymous_formula,
    hill_formula,
    normalize_unicode_digits,
    normalize_unicode_digits_col,
    parse_formula,
)
from mr_dice_spark.functions.ids import (
    convert_pressure,
    pick_identifier,
    pressure_unit_dim,
    shorten_id,
)
from mr_dice_spark.functions.spacegroup import (
    HM_SYMBOLS,
    spacegroup_dim,
    spacegroup_symbol,
    tcod_spacing,
)
from mr_dice_spark.functions.text import (
    LANG_PROFILES,
    bpe_ish_token_count,
    detect_language,
    doc_fingerprint,
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
    "convert_pressure",
    "pick_identifier",
    "pressure_unit_dim",
    "shorten_id",
    "HM_SYMBOLS",
    "spacegroup_dim",
    "spacegroup_symbol",
    "tcod_spacing",
    "LANG_PROFILES",
    "bpe_ish_token_count",
    "detect_language",
    "doc_fingerprint",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count",
    "tokens",
]
