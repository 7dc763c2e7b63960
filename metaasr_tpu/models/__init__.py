from metaasr_tpu.models.vgg_blstm import VGGBLSTMCTC
from metaasr_tpu.models.transformer import TransformerASR

__all__ = ["VGGBLSTMCTC", "TransformerASR"]
