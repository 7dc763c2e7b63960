from metaasr_tpu.decode.greedy import ctc_greedy_decode, collapse_ctc

__all__ = ["ctc_greedy_decode", "collapse_ctc"]
