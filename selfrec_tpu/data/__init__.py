from selfrec_tpu.data.interaction import Interaction
from selfrec_tpu.data.sequence import Sequence
from selfrec_tpu.data.social import Relation

__all__ = ["Interaction", "Sequence", "Relation"]
