from metaasr_tpu.frontend.fbank import FbankParams, log_mel_fbank, num_frames
from metaasr_tpu.frontend.specaug import spec_augment

__all__ = ["FbankParams", "log_mel_fbank", "num_frames", "spec_augment"]
