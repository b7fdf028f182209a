"""selfrec_tpu — a TPU-native self-supervised recommendation framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of SELFRec
(reference: /root/reference). One backend (JAX), one model contract,
arrays not dicts: all steady-state compute runs as pjit-compiled step
functions over explicit device meshes; host Python only does one-time
dataset preprocessing and final metric bookkeeping.

Public entry points:
    from selfrec_tpu import SelfRecTPU, ModelConf
    rec = SelfRecTPU(ModelConf('conf/LightGCN.yaml'))
    rec.execute()
"""

from selfrec_tpu.config import ModelConf
from selfrec_tpu.session import SelfRecTPU

__version__ = "0.1.0"

__all__ = ["ModelConf", "SelfRecTPU", "__version__"]
