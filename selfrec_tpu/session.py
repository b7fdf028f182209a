"""Session driver.

Equivalent of the reference ``SELFRec`` dispatcher
(/root/reference/SELFRec.py:4-25): load raw train/test (+social) data once,
construct the model class from the registry, run its pipeline.
"""

from __future__ import annotations

from selfrec_tpu.config import ModelConf
from selfrec_tpu.data import io
from selfrec_tpu.models import get_model_class, MODEL_REGISTRY


class SelfRecTPU:
    def __init__(self, config: ModelConf):
        self.config = config
        if config.get("distributed"):
            from selfrec_tpu.parallel.distributed import (
                maybe_initialize,
                process_info,
            )

            maybe_initialize(config)
            print(process_info())
        rec_type = config["model"]["type"]
        self.training_data = None
        if rec_type == "graph":
            # array-native fast path: native loader + Interaction's mapped
            # constructor, skipping per-triple Python loops entirely
            self.training_data = io.load_graph_mapped(config["training.set"])
        if self.training_data is None:
            self.training_data = io.load_data_set(config["training.set"], rec_type)
        self.test_data = io.load_data_set(config["test.set"], rec_type)
        self.kwargs = {}
        if config.contain("social.data"):
            social_data = io.load_social_data(config["social.data"])
            self.kwargs["social.data"] = social_data
        print("Reading data and preprocessing...")

    def execute(self):
        model_name = self.config["model"]["name"]
        cls = get_model_class(model_name)
        recommender = cls(self.config, self.training_data, self.test_data, **self.kwargs)
        return recommender.execute()


def available_models():
    return sorted(MODEL_REGISTRY)
