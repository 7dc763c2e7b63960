from metaasr_tpu.train.metrics import edit_distance, compute_wer, compute_cer, ErrorRate

__all__ = ["edit_distance", "compute_wer", "compute_cer", "ErrorRate"]
