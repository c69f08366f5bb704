from etl_poc_spark.multimodal.media import (  # noqa: F401
    MEDIA_META_SCHEMA,
    decode_image_meta,
    frame_sample_stub,
    read_binary_dir,
)
