from metaasr_tpu.models.vgg_blstm import VGGBLSTMCTC
from metaasr_tpu.models.transformer import TransformerASR
from metaasr_tpu.models.conformer import ConformerEncoder

__all__ = ["VGGBLSTMCTC", "TransformerASR", "ConformerEncoder"]
