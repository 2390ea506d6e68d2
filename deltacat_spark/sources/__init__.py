"""Sources/sinks: multi-format IO, multimodal binary tables, URL API."""

from deltacat_spark.sources.formats import read_url, write_url
from deltacat_spark.sources.multimodal import (
    binary_file_table,
    fake_decode_images,
    frame_sample,
)

__all__ = [
    "binary_file_table",
    "fake_decode_images",
    "frame_sample",
    "read_url",
    "write_url",
]
