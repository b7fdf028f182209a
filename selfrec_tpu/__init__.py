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

import os as _os


def _maybe_enable_compile_cache():
    """Opt-in persistent XLA compilation cache.

    ``SELFREC_TPU_COMPILE_CACHE=<dir>`` makes every jit compile in the
    framework (epoch scans, eval ranking, KNN builds) persist its
    executable to <dir> and reload it on later process runs — the
    reference has no equivalent (torch eager recompiles nothing but also
    caches nothing). Biggest effect on compile-dominated walltimes: the
    UserKNN+ItemKNN similarity build is ~11 s XLA compile over ~1 s
    device work cold, and skips straight to device work warm. Off by
    default: cache reuse keys on jaxlib/backend fingerprints, and an
    opt-in keeps bench cold-start numbers honest.
    """
    path = _os.environ.get("SELFREC_TPU_COMPILE_CACHE")
    if not path:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # JAX's default min-compile-time threshold (1s) already keeps trivial
    # kernels out of the cache; only the dir needs setting.


_maybe_enable_compile_cache()

from selfrec_tpu.config import ModelConf
from selfrec_tpu.session import SelfRecTPU

__version__ = "0.1.0"

__all__ = ["ModelConf", "SelfRecTPU", "__version__"]
