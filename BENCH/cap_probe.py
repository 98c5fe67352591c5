#!/usr/bin/env python
"""fingerprint_max_tokens: recall-vs-cap measurement (VERDICT r4 #5).

The cap bounds per-doc kernel cost by fingerprinting only the first N
tokens. Its two effects, measured separately on a long-doc corpus
(32k-token docs — the web's heavy tail):

  * jaccard-gate near-dups with edits spread UNIFORMLY: prefix
    similarity estimates global similarity, so recall should hold at any
    cap that keeps enough shingles.
  * tail-only-overlap pairs (different heads, identical 16k-token
    tails): the substring pass catches them UNCAPPED (a true long
    verbatim overlap); a cap that ends before the overlap makes them
    invisible — the knob's real, documented semantic loss.
  * kernel wall: the families stage cost the cap exists to bound.

Usage: python BENCH/cap_probe.py   (prints one JSON line per cap)
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from umi_dedup_spark.config import DedupConfig
from umi_dedup_spark.plans.pipeline import DedupPipeline
from umi_dedup_spark.session import get_spark, warm_python_workers
from umi_dedup_spark.synth import documents_to_pages

N_TOKENS = 32_768
CAPS = (None, 4096, 16384)


def build_corpus(seed: int = 13, n_uniform: int = 40, n_tail: int = 20):
    rng = random.Random(seed)
    docs, pairs = [], []
    nid = 0

    def add(toks, src):
        nonlocal nid
        did = nid
        nid += 1
        docs.append(
            {"doc_id": did, "text": " ".join(toks), "lang": "en",
             "source": src, "n_chars": sum(len(t) + 1 for t in toks)}
        )
        return did

    for i in range(n_uniform):
        base = [f"u{i}t{j}" for j in range(N_TOKENS)]
        var = list(base)
        for pos in rng.sample(range(N_TOKENS), N_TOKENS // 50):  # 2% edits
            var[pos] = f"u{i}e{pos}"
        pairs.append(
            {"a": add(base, f"u{i}"), "b": add(var, f"u{i}"), "kind": "uniform"}
        )
    for i in range(n_tail):
        tail = [f"s{i}t{j}" for j in range(N_TOKENS // 2)]
        a = [f"s{i}a{j}" for j in range(N_TOKENS // 2)] + tail
        b = [f"s{i}b{j}" for j in range(N_TOKENS // 2)] + tail
        pairs.append(
            {"a": add(a, f"s{i}"), "b": add(b, f"s{i}"), "kind": "tail_overlap"}
        )
    return pd.DataFrame(docs), pairs


def main() -> None:
    docs, pairs = build_corpus()
    spark = get_spark("cap-probe", shuffle_partitions=16)
    warm_python_workers(spark)
    sdf = spark.createDataFrame(docs)
    sdf.persist().count()

    for cap in CAPS:
        cfg = DedupConfig(fingerprint_max_tokens=cap, shuffle_partitions=16)
        pipe = DedupPipeline(spark, cfg)
        t0 = time.time()
        res = pipe.run(documents_to_pages(sdf))
        assign = {
            r["doc_id"]: r["cluster_id"]
            for r in res.marked.select("doc_id", "cluster_id").collect()
        }
        wall = time.time() - t0
        rep = {"cap": cap, "wall_sec": round(wall, 1),
               "families_stage_sec": res.stage_times.get("families")}
        for kind in ("uniform", "tail_overlap"):
            sel = [p for p in pairs if p["kind"] == kind]
            hit = sum(1 for p in sel if assign.get(p["a"]) == assign.get(p["b"]))
            rep[f"{kind}_recall"] = round(hit / len(sel), 4)
            rep[f"{kind}_n"] = len(sel)
        print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
