from mr_dice_spark.sources.registry import multi_provider_scan, read_table, read_with_quarantine
from mr_dice_spark.sources.sinks import (
    cif_text_column,
    derive_output_path,
    filter_to_tag,
    tagged_output_dir,
    write_json_sink,
    write_manifest,
)

__all__ = [
    "multi_provider_scan",
    "read_table",
    "read_with_quarantine",
    "cif_text_column",
    "derive_output_path",
    "filter_to_tag",
    "tagged_output_dir",
    "write_json_sink",
    "write_manifest",
]
