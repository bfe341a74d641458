#!/usr/bin/env python
"""Two-point scale sweep for the hottest pipeline operators (VERDICT r3
item 2): run each at sf0.1 and at a synthetic 10x fixture and assert
wall-time grows at most ~linearly. The sf0.1 bench alone cannot see a
super-linear term; two points bound the exponent.

Fixture construction (built in a temp dir, nothing outside the repo or
/tmp is touched):

- documents x10: copy k of each doc gets every word suffixed with _k and
  doc_id shifted by k*10^7. Per-doc shingle/gram volume (the CPU driver)
  is identical to the original, within-copy near-dup structure replicates
  exactly, and CROSS-copy similarity is zero — so the true output (dup
  pairs, contaminated docs) scales exactly 10x and a fair linearity
  measurement is possible. A naive byte-duplicate would plant 10-clique
  duplicates whose PAIR count grows 45x — superlinear in the answer
  itself, not in the engine.
- embeddings x10: copy 0 is the original; copies 1..9 are fresh seeded
  gaussians (same row count/dim). LSH bucket geometry: at 10x rows the
  operating rule is bits += log2(scale) (bucket count tracks corpus
  size, keeping per-bucket occupancy — and thus per-bucket compare cost —
  constant); the sweep times ann_lsh_topk with bits=4 at 1x vs bits=7 at
  10x, i.e. the configuration a 10x deployment would actually run.
  Holding bits fixed while the corpus grows is definitionally quadratic
  for ANY LSH (occupancy doubles => compares quadruple) and measures the
  parameter mistake, not the engine.
- ingest: the e2e batch is synthetic already; 10k posts vs 100k posts.

Usage: python tools/scale_sweep.py [--runs 2]
Prints one JSON line: {"queries": {name: {"t1": s, "t10": s,
"ratio": r}}, ...}; ratio is t10/t1 (10.0 == perfectly linear).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/testdata/sf0.1"
SCALE = 10


def build_fixture(workdir: str) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(workdir, "sf1x10")
    os.makedirs(out, exist_ok=True)

    docs = pq.read_table(os.path.join(SF1, "documents.parquet"))
    pdf = docs.to_pandas()
    parts = []
    for k in range(SCALE):
        cp = pdf.copy()
        if k:
            sfx = f"_{k}"
            cp["text"] = [
                " ".join(w + sfx for w in t.split()) for t in cp["text"]
            ]
            cp["doc_id"] = cp["doc_id"] + k * 10_000_000
            cp["n_chars"] = cp["text"].str.len()
        parts.append(cp)
    import pandas as pd

    big = pd.concat(parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(big, preserve_index=False),
        os.path.join(out, "documents.parquet"),
    )

    emb = pq.read_table(os.path.join(SF1, "embeddings.parquet")).to_pandas()
    dim = len(emb["embedding"].iloc[0])
    eparts = [emb]
    for k in range(1, SCALE):
        rng = np.random.RandomState(1000 + k)
        cp = emb.copy()
        cp["vec_id"] = cp["vec_id"] + k * 10_000_000
        cp["embedding"] = [
            row.astype(np.float32)
            for row in rng.randn(len(emb), dim)
        ]
        eparts.append(cp)
    bige = pd.concat(eparts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(bige, preserve_index=False),
        os.path.join(out, "embeddings.parquet"),
    )
    return out


def timed(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from build_a_cloud_based_batch_etl_pipeline_spark.queries import load_all
    from build_a_cloud_based_batch_etl_pipeline_spark.session import get_spark
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.similarity import (
        ann_lsh_topk,
    )
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.util import t as tbl

    spark = get_spark("scale_sweep")
    reg = load_all()

    def materialize(df):
        df.write.mode("overwrite").format("noop").save()

    workdir = tempfile.mkdtemp(prefix="scale_sweep_")
    results: dict[str, dict[str, float]] = {}
    try:
        big_dir = build_fixture(workdir)

        doc_queries = [
            "decontaminate_ngram_overlap",
            "dedup_minhash_pairs",
            "text_tfidf",
            "doc_chunk_cdc",
            "text_heavy_hitters_cms",
        ]
        for name in doc_queries:
            fn = reg[name].fn
            t1 = timed(lambda: materialize(fn(spark, SF1)), args.runs)
            t10 = timed(lambda: materialize(fn(spark, big_dir)), args.runs)
            results[name] = {"t1": t1, "t10": t10, "ratio": round(t10 / t1, 2)}

        # ann_lsh: bits tracks corpus size (see module docstring).
        def ann(sf_dir: str, bits: int):
            emb = tbl(spark, sf_dir, "embeddings").select("vec_id", "embedding")
            materialize(
                ann_lsh_topk(emb, bits=bits, tables=8, cache_key=("sweep", sf_dir, bits))
            )

        t1 = timed(lambda: ann(SF1, 4), args.runs)
        t10 = timed(lambda: ann(big_dir, 7), args.runs)
        results["embed_ann_lsh(bits~log N)"] = {
            "t1": t1, "t10": t10, "ratio": round(t10 / t1, 2)
        }

        # ingest e2e: 10k vs 100k posts through extract -> landing -> load.
        import json as _json

        from build_a_cloud_based_batch_etl_pipeline_spark import ingest
        from build_a_cloud_based_batch_etl_pipeline_spark.config import IngestConfig

        def ingest_run(n_posts: int) -> None:
            payload = _json.dumps(
                [
                    {"userId": i % 97, "id": i, "title": f"t{i}", "body": "x" * 80}
                    for i in range(n_posts)
                ]
            ).encode()
            wd = tempfile.mkdtemp(prefix="sweep_ingest_", dir=workdir)
            cfg = IngestConfig(
                source_url="fake://posts",
                landing_uri=f"{wd}/landing",
                warehouse_uri=f"{wd}/warehouse",
                checkpoint_uri=f"{wd}/ckpt",
            )
            ingest.extract_to_landing(spark, cfg, fetcher=lambda url: payload)
            assert ingest.load_landing_to_table(spark, cfg) == n_posts

        t1 = timed(lambda: ingest_run(10_000), args.runs)
        t10 = timed(lambda: ingest_run(100_000), args.runs)
        results["ingest_e2e"] = {"t1": t1, "t10": t10, "ratio": round(t10 / t1, 2)}
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    print(json.dumps({"scale": SCALE, "runs": args.runs, "queries": results}))


if __name__ == "__main__":
    main()
