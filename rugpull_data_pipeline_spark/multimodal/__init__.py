from .columns import (  # noqa: F401
    attach_blob_column,
    decode_image_features,
    extract_blob_metadata,
    sample_frames,
)
