"""Model registry.

Replaces the reference's ``exec``/``eval`` dynamic import
(/root/reference/SELFRec.py:22-25) with an explicit registry: model name →
(module, class). Model names and their YAML config sections are identical to
the reference's so configs are drop-in.
"""

from __future__ import annotations

import importlib
from typing import Dict, Tuple

# name -> (module path, class name, model type)
MODEL_REGISTRY: Dict[str, Tuple[str, str, str]] = {
    # graph models
    "MF": ("selfrec_tpu.models.graph.mf", "MF", "graph"),
    "LightGCN": ("selfrec_tpu.models.graph.lightgcn", "LightGCN", "graph"),
    "DirectAU": ("selfrec_tpu.models.graph.directau", "DirectAU", "graph"),
    "SimGCL": ("selfrec_tpu.models.graph.simgcl", "SimGCL", "graph"),
    "XSimGCL": ("selfrec_tpu.models.graph.xsimgcl", "XSimGCL", "graph"),
    "SGL": ("selfrec_tpu.models.graph.sgl", "SGL", "graph"),
    "NCL": ("selfrec_tpu.models.graph.ncl", "NCL", "graph"),
    "MixGCF": ("selfrec_tpu.models.graph.mixgcf", "MixGCF", "graph"),
    "BUIR": ("selfrec_tpu.models.graph.buir", "BUIR", "graph"),
    "SelfCF": ("selfrec_tpu.models.graph.selfcf", "SelfCF", "graph"),
    "SSL4Rec": ("selfrec_tpu.models.graph.ssl4rec", "SSL4Rec", "graph"),
    "UserKNN": ("selfrec_tpu.models.graph.userknn", "UserKNN", "graph"),
    "ItemKNN": ("selfrec_tpu.models.graph.itemknn", "ItemKNN", "graph"),
    "MHCN": ("selfrec_tpu.models.graph.mhcn", "MHCN", "graph"),
    "SEPT": ("selfrec_tpu.models.graph.sept", "SEPT", "graph"),
    # sequential models
    "SASRec": ("selfrec_tpu.models.sequential.sasrec", "SASRec", "sequential"),
    "CL4SRec": ("selfrec_tpu.models.sequential.cl4srec", "CL4SRec", "sequential"),
    "BERT4Rec": ("selfrec_tpu.models.sequential.bert4rec", "BERT4Rec", "sequential"),
}


def get_model_class(name: str):
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"Unknown model {name!r}. Available: {sorted(MODEL_REGISTRY)}"
        )
    module_path, class_name, _ = MODEL_REGISTRY[name]
    module = importlib.import_module(module_path)
    return getattr(module, class_name)


def model_type(name: str) -> str:
    return MODEL_REGISTRY[name][2]
