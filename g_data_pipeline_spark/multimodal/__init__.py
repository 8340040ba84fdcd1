from g_data_pipeline_spark.multimodal.media import (
    FEATURE_SCHEMA,
    MEDIA_FIELDS,
    decode_image_features,
    encode_fake_image,
    encode_fake_video,
    frame_sample,
    resize_images,
    video_frame_stats,
)

__all__ = [
    "FEATURE_SCHEMA",
    "MEDIA_FIELDS",
    "decode_image_features",
    "encode_fake_image",
    "encode_fake_video",
    "frame_sample",
    "resize_images",
    "video_frame_stats",
]
