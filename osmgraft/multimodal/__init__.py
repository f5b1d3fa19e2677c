from osmgraft.multimodal.media import (
    MEDIA_SCHEMA,
    attach_media,
    decode_image_stub,
    extract_image_features,
    resize_images,
    sample_video_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media",
    "decode_image_stub",
    "extract_image_features",
    "resize_images",
    "sample_video_frames",
]
