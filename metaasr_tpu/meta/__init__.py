from metaasr_tpu.meta.maml import make_inner_adapt, make_meta_loss, MetaAlgoConfig

__all__ = ["make_inner_adapt", "make_meta_loss", "MetaAlgoConfig"]
