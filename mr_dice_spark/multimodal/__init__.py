from mr_dice_spark.multimodal.ops import (
    ahash_images,
    extract_frames,
    audio_features,
    image_dedup_ahash,
    image_features,
    payload_from_text,
    probe_audio,
    probe_images,
    probe_videos,
    read_media_dir,
    resize_images,
    sample_frames,
)
from mr_dice_spark.multimodal.schema import (
    AUDIO_META,
    IMAGE_META,
    VIDEO_META,
    media_table_schema,
)

__all__ = [
    "ahash_images",
    "image_dedup_ahash",
    "extract_frames",
    "AUDIO_META",
    "IMAGE_META",
    "VIDEO_META",
    "media_table_schema",
    "audio_features",
    "image_features",
    "payload_from_text",
    "probe_audio",
    "probe_images",
    "probe_videos",
    "read_media_dir",
    "resize_images",
    "sample_frames",
]
