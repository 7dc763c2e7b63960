from metaasr_tpu.utils.padding import (
    make_pad_mask,
    make_non_pad_mask,
    subsampled_lengths,
    pad_to,
    bucket_length,
)

__all__ = [
    "make_pad_mask",
    "make_non_pad_mask",
    "subsampled_lengths",
    "pad_to",
    "bucket_length",
]
