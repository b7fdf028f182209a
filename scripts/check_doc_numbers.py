#!/usr/bin/env python
"""One number of record (VERDICT r3 #5): every headline number in the docs
must equal the committed BENCH_MATRIX.json / REF_BASELINES.json.

Each BINDING names a doc file, a regex whose capture groups are the bound
numbers, and per-group (compute, format) specs evaluated against the
artifacts. ``python scripts/check_doc_numbers.py`` fails loudly on drift
(run by tests/test_doc_numbers.py); ``--fix`` rewrites the doc numbers from
the artifacts — run it after every bench re-capture so the docs can never
drift again.
"""

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fmt(value, kind):
    if kind == "ic":  # comma-grouped int
        return f"{round(float(value)):,}"
    if kind == "x1":  # multiple, 1 decimal
        return f"{float(value):.1f}"
    if kind == "s3":  # seconds, 3 decimals
        return f"{float(value):.3f}"
    if kind == "s2":
        return f"{float(value):.2f}"
    if kind == "f1":  # bare float, 1 decimal (JSON artifacts)
        return f"{float(value):.1f}"
    raise ValueError(kind)


def _get(d, path):
    for k in path.split("."):
        d = d[k]
    return d


def bindings(m, r):
    """(relpath, regex, [(expected_string), ...]) — group i binds spec i."""
    simgcl_bf16 = _get(m, "simgcl.detail.modes.bf16_default.value")

    def B(f, rx, *specs):
        return (f, rx, [_fmt(v, k) for v, k in specs])

    out = [
        # README.md benchmark section
        B("README.md",
          r"SimGCL training: \*\*([\d,]+) examples/s \(([\d.]+)x\)\*\* in the bf16 default",
          (simgcl_bf16, "ic"), (simgcl_bf16 / r["simgcl"], "x1")),
        B("README.md",
          r"\*\*([\d,]+) examples/s — ([\d.]+)x\*\* the reference's own loop",
          (m["simgcl"]["value"], "ic"), (m["simgcl"]["vs_baseline"], "x1")),
        B("README.md",
          r"→\s*([\d,]+) \(exact int8-factored block",
          (simgcl_bf16, "ic")),
        B("README.md", r"→ ([\d,]+) \(int8x8\)", (m["simgcl"]["value"], "ic")),
        B("README.md",
          r"SASRec training: \*\*([\d,]+) sequences/s — ([\d.]+)x\*\* the reference \(([\d,]+)\)",
          (m["sasrec"]["value"], "ic"), (m["sasrec"]["vs_baseline"], "x1"),
          (r["sasrec"], "ic")),
        B("README.md",
          r"MHCN training: \*\*([\d,]+) examples/s at quarter-douban scale — ([\d.]+)x\*\*",
          (m["mhcn"]["value"], "ic"), (m["mhcn"]["vs_baseline"], "x1")),
        B("README.md",
          r"SEPT joint tri-training:\s*\*\*([\d,]+) examples/s — ([\d.]+)x\*\*",
          (m["sept"]["value"], "ic"), (m["sept"]["vs_baseline"], "x1")),
        B("README.md",
          r"Full-rank eval: all 31,667 yelp-scale test users in \*\*([\d.]+)s\*\*",
          (m["eval"]["value"], "s3")),
        B("README.md",
          r"TOP model — \*\*([\d,]+) ex/s \(([\d.]+)x its own torch\s+code\)\*\*",
          (m["xsimgcl"]["value"], "ic"), (m["xsimgcl"]["vs_baseline"], "x1")),
        B("README.md", r"SGL \*\*([\d,]+) ex/s\s+\(([\d.]+)x\)\*\*",
          (m["sgl"]["value"], "ic"), (m["sgl"]["vs_baseline"], "x1")),
        B("README.md",
          r"blocks, ([\d.]+)x the packed-ELL chain",
          (_get(m, "sgl.detail.dense_over_ell"), "x1")),
        B("README.md",
          r"NCL proto phase \*\*([\d,]+) ex/s\s+\(([\d.]+)x\)\*\* with the on-device k-means e-step at ([\d.]+)s/epoch",
          (m["ncl"]["value"], "ic"), (m["ncl"]["vs_baseline"], "x1"),
          (_get(m, "ncl.detail.modes.int8x8.kmeans_estep_s"), "s3")),
        B("README.md", r"MixGCF \*\*([\d,]+) ex/s \(([\d.]+)x\)\*\*",
          (m["mixgcf"]["value"], "ic"), (m["mixgcf"]["vs_baseline"], "x1")),
        B("README.md",
          r"BUIR\s+\*\*([\d,]+) ex/s \(([\d.]+)x its own torch code\)\*\*",
          (m["buir"]["value"], "ic"), (m["buir"]["vs_baseline"], "x1")),
        B("README.md", r"BERT4Rec \*\*([\d,]+) seq/s\s+\(([\d.]+)x\)\*\*",
          (m["bert4rec"]["value"], "ic"), (m["bert4rec"]["vs_baseline"], "x1")),
        B("README.md", r"CL4SRec \*\*([\d,]+) seq/s \(([\d.]+)x\)\*\*",
          (m["cl4srec"]["value"], "ic"), (m["cl4srec"]["vs_baseline"], "x1")),
        # README.md round-4 completions bullet
        B("README.md", r"MF \*\*([\d,]+) ex/s \(([\d.]+)x\)\*\*",
          (m["mf"]["value"], "ic"), (m["mf"]["vs_baseline"], "x1")),
        B("README.md", r"LightGCN at the leaderboard hyperparams\s+\(n_layer=3, comparator config-matched\) \*\*([\d,]+) ex/s \(([\d.]+)x\)\*\*",
          (m["lightgcn"]["value"], "ic"), (m["lightgcn"]["vs_baseline"], "x1")),
        B("README.md", r"DirectAU \*\*([\d,]+) ex/s \(([\d.]+)x\)\*\*",
          (m["directau"]["value"], "ic"), (m["directau"]["vs_baseline"], "x1")),
        B("README.md", r"SSL4Rec\s+\*\*([\d,]+) ex/s \(([\d.]+)x\)\*\*",
          (m["ssl4rec"]["value"], "ic"), (m["ssl4rec"]["vs_baseline"], "x1")),
        B("README.md", r"SelfCF \*\*([\d,]+) ex/s \(([\d.]+)x\)\*\*",
          (m["selfcf"]["value"], "ic"), (m["selfcf"]["vs_baseline"], "x1")),
        B("README.md",
          r"\*\*([\d.]+)s wall\*\* \(warm compile cache[\s\S]*?extrapolated ([\d,]+)s O\(U²\) loop \(\*\*([\d.]+)x\*\*\)",
          (m["knn"]["value"], "s3"), (r["userknn"], "ic"),
          (m["knn"]["vs_baseline"], "x1")),
        B("README.md",
          r"eval of ([\d,]+) sequences in \*\*([\d.]+)s \(([\d.]+)x\)\*\*",
          (_get(m, "seq_eval.detail.sequences"), "ic"),
          (m["seq_eval"]["value"], "s3"), (m["seq_eval"]["vs_baseline"], "x1")),
        # SURVEY.md §10 round-3 delta claims
        B("SURVEY.md", r"SimGCL \*\*([\d,]+) ex/s\s+\(([\d.]+)x\)\*\*, quality-gated",
          (m["simgcl"]["value"], "ic"), (m["simgcl"]["vs_baseline"], "x1")),
        B("SURVEY.md", r"MHCN \*\*([\d,]+) ex/s \(([\d.]+)x\)\*\*, SEPT joint\s+\*\*([\d,]+) ex/s \(([\d.]+)x\)\*\*",
          (m["mhcn"]["value"], "ic"), (m["mhcn"]["vs_baseline"], "x1"),
          (m["sept"]["value"], "ic"), (m["sept"]["vs_baseline"], "x1")),
        B("SURVEY.md", r"full-rank eval \*\*([\d.]+)s\*\*",
          (m["eval"]["value"], "s3")),
        # SURVEY.md §11 round-4 delta claims (VERDICT r4 weak 3)
        B("SURVEY.md",
          r"new: mf ([\d.]+)x, lightgcn ([\d.]+)x,\s+directau ([\d.]+)x, "
          r"ssl4rec ([\d.]+)x, selfcf ([\d.]+)x, knn build ([\d.]+)x\s+"
          r"\(rate-extrapolated O\(U\^2\) reference loop\), seq_eval ([\d.]+)x",
          (m["mf"]["vs_baseline"], "x1"),
          (m["lightgcn"]["vs_baseline"], "x1"),
          (m["directau"]["vs_baseline"], "x1"),
          (m["ssl4rec"]["vs_baseline"], "x1"),
          (m["selfcf"]["vs_baseline"], "x1"),
          (m["knn"]["vs_baseline"], "x1"),
          (m["seq_eval"]["vs_baseline"], "x1")),
        B("SURVEY.md", r"— \*\*([\d,]+) ex/s, ([\d.]+)x the\s+reference\*\*",
          (m["buir"]["value"], "ic"), (m["buir"]["vs_baseline"], "x1")),
        B("SURVEY.md", r"\(5\.26s -> ([\d.]+)s —",
          (m["seq_eval"]["value"], "s3")),
        B("SURVEY.md", r"actually runs: 0\.755s -> ([\d.]+)s\)",
          (m["eval"]["value"], "s3")),
        B("SURVEY.md",
          r"e\.g\. MF ([\d,]+) ex/s \(([\d.]+)x\), MHCN ([\d,]+)\s+"
          r"\(([\d.]+)x\), SSL4Rec ([\d,]+) \(([\d.]+)x\)",
          (m["mf"]["value"], "ic"), (m["mf"]["vs_baseline"], "x1"),
          (m["mhcn"]["value"], "ic"), (m["mhcn"]["vs_baseline"], "x1"),
          (m["ssl4rec"]["value"], "ic"), (m["ssl4rec"]["vs_baseline"], "x1")),
        # PARITY.md round-5 bootstrap-family gate entry (review finding:
        # PARITY numbers were unbound and drifted on recapture)
        B("PARITY.md",
          r"their matrix entries stay bf16\*\* \(still ([\d.]+)x/([\d.]+)x",
          (m["buir"]["vs_baseline"], "x1"),
          (m["selfcf"]["vs_baseline"], "x1")),
        # MULTICHIP_SCALING.json tpu_single_chip block (VERDICT r4 weak 3)
        B("MULTICHIP_SCALING.json",
          r"\"examples_per_s_bf16_default\": ([\d.]+),\s+"
          r"\"examples_per_s_int8x8\": ([\d.]+),",
          (_get(m, "simgcl.detail.modes.bf16_default.value"), "f1"),
          (m["simgcl"]["value"], "f1")),
    ]
    return out


def main():
    fix = "--fix" in sys.argv
    with open(os.path.join(REPO, "BENCH_MATRIX.json")) as f:
        m = json.load(f)
    with open(os.path.join(REPO, "REF_BASELINES.json")) as f:
        r = {k: v.get("examples_per_sec", v.get("seconds"))
             for k, v in json.load(f).items()}

    errors = []
    by_file = {}
    for relpath, rx, expected in bindings(m, r):
        by_file.setdefault(relpath, []).append((rx, expected))

    for relpath, binds in by_file.items():
        path = os.path.join(REPO, relpath)
        with open(path) as f:
            text = f.read()
        for rx, expected in binds:
            match = re.search(rx, text)
            if not match:
                errors.append(f"{relpath}: pattern not found: {rx!r}")
                continue
            got = [match.group(i + 1) for i in range(len(expected))]
            if got != expected:
                if fix:
                    new = text[: match.start()]
                    seg = match.group(0)
                    # replace groups right-to-left inside the match
                    for i in range(len(expected) - 1, -1, -1):
                        s = match.start(i + 1) - match.start()
                        e = match.end(i + 1) - match.start()
                        seg = seg[:s] + expected[i] + seg[e:]
                    text = new + seg + text[match.end():]
                else:
                    errors.append(
                        f"{relpath}: {got} != record {expected}  ({rx!r})")
        if fix:
            with open(path, "w") as f:
                f.write(text)

    if fix:
        print("docs re-synced to BENCH_MATRIX.json")
        return 0
    if errors:
        print("DOC NUMBER DRIFT (run scripts/check_doc_numbers.py --fix):")
        for e in errors:
            print(" -", e)
        return 1
    print(f"doc numbers OK ({sum(len(v) for v in by_file.values())} bindings)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
