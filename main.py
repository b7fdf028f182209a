#!/usr/bin/env python
"""CLI driver.

Superset of the reference's interactive menu (/root/reference/main.py:1-34):
run ``python main.py`` with no arguments for the same pick-a-model prompt, or
non-interactively (new capability, SURVEY.md §5 config row):

    python main.py --model SimGCL
    python main.py --conf conf/SimGCL.yaml --set learning.rate=0.01 \
        --set SimGCL.lambda=0.2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from selfrec_tpu.config import ModelConf
from selfrec_tpu.models import MODEL_REGISTRY
from selfrec_tpu.session import SelfRecTPU, available_models

CONF_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "conf")

GRAPH_BASELINES = ["MF", "LightGCN", "DirectAU", "UserKNN", "ItemKNN"]
SSL_GRAPH = [
    "SGL", "SimGCL", "XSimGCL", "NCL", "MixGCF", "BUIR",
    "SelfCF", "SSL4Rec", "MHCN", "SEPT",
]
SEQUENTIAL = ["SASRec", "CL4SRec", "BERT4Rec"]


def print_menu():
    print("=" * 80)
    print("SELFRec-TPU: a TPU-native library for self-supervised recommendation.")
    print("=" * 80)
    print("Graph-Based Baseline Models:")
    print("   " + "   ".join(GRAPH_BASELINES))
    print("-" * 80)
    print("Self-Supervised Graph-Based Models:")
    print("   " + "   ".join(SSL_GRAPH))
    print("=" * 80)
    print("Sequential Baseline Models:")
    print("   SASRec")
    print("-" * 80)
    print("Self-Supervised Sequential Models:")
    print("   CL4SRec   BERT4Rec")
    print("=" * 80)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", help="model name (uses conf/<model>.yaml)")
    parser.add_argument("--conf", help="path to a YAML config file")
    parser.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="dotted config override, e.g. --set SimGCL.lambda=0.2",
    )
    args = parser.parse_args(argv)

    model = args.model
    conf_path = args.conf
    if not model and not conf_path:
        print_menu()
        model = input("Please enter the model you want to run:").strip()
    if not conf_path:
        if model not in MODEL_REGISTRY:
            print(f"Wrong model name! Available: {', '.join(available_models())}")
            sys.exit(1)
        conf_path = os.path.join(CONF_DIR, f"{model}.yaml")

    overrides = {}
    for item in args.set:
        key, _, value = item.partition("=")
        if not _:
            parser.error(f"--set expects KEY=VALUE, got {item!r}")
        overrides[key] = value

    s = time.time()
    conf = ModelConf(conf_path, overrides=overrides)
    SelfRecTPU(conf).execute()
    e = time.time()
    print("Running time: %f s" % (e - s))


if __name__ == "__main__":
    main()
