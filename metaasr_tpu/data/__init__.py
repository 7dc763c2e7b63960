from metaasr_tpu.data.tokenizer import CharTokenizer, PhoneTokenizer
from metaasr_tpu.data.dataset import AccentDataset, Manifest, Utterance
from metaasr_tpu.data.sampler import TaskSampler, BucketBatcher, collate

__all__ = [
    "CharTokenizer",
    "PhoneTokenizer",
    "AccentDataset",
    "Manifest",
    "Utterance",
    "TaskSampler",
    "BucketBatcher",
    "collate",
]
