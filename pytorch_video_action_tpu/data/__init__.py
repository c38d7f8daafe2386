from .bundles import (
    ClassMapping,
    load_class_mapping,
    load_label_file,
    load_segment_file,
    load_split_filenames,
    parse_class_mapping,
    read_lines,
    strip_bundle_prefix,
)
from .collate import BatchFeed, bucket_length, pad_batch
from .dataset import VideoDataset, exclude_label
from .sampler import BucketBatchSampler
