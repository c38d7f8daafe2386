from .runlength import (
    run_length_segments,
    segment_label_sequence,
    split_into_segments,
)
