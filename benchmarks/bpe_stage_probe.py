"""Stage split of the sf10 bpe_train_tokenize lane row (VERDICT r14 #6):
is the 33-38 s dominated by the ONE corpus-scale pass (word_counts),
the per-round driver merge loop over the vocabulary table, or the final
corpus-scale token count?

Stages (mirroring the lane body `bpe_train(documents100, rounds=6)` +
`bpe_token_counts(...).agg(sum)`):

* word_counts      — corpus pass → (word, n), checkpointed
* merge_rounds     — bpe_train over the PRECOMPUTED word table
                     (word_counts_df=...), i.e. 6 × (pair explode +
                     groupBy + top-1 collect + replace) on the
                     vocabulary-sized table — the driver-loop cost
* token_counts     — bpe_token_counts over the corpus with the learned
                     merges (map-only pass + sum)

word_counts + merge_rounds ≈ the lane's bpe_train term;
token_counts ≈ the rest. If merge_rounds dominates, batching the
per-round pair evaluation is the §1.2 fix; if the two corpus passes
dominate, the row is scan-bound and 6 rounds of vocab work are noise.

Run: python benchmarks/bpe_stage_probe.py [corpus_parquet_or_sf_dir] [rounds]
Prints one JSON object per repetition.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, make_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DIR
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from truthound_spark.pipeline.tokenizer import (
        bpe_token_counts,
        bpe_train,
        word_counts,
    )

    if os.path.exists(os.path.join(sf_dir, "_SUCCESS")) or sf_dir.endswith(
        ".parquet"
    ):
        documents = spark.read.parquet(sf_dir).select("doc_id", "text")
    else:
        documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    documents.count()

    for rep in range(3):
        t: dict[str, float] = {}
        spark.sparkContext.setJobDescription(f"bpe probe rep{rep}: word_counts")
        t0 = time.time()
        wc = word_counts(documents).localCheckpoint(eager=True)
        t["word_counts"] = round(time.time() - t0, 3)
        t["vocab_rows"] = wc.count()

        spark.sparkContext.setJobDescription(f"bpe probe rep{rep}: merge rounds")
        t0 = time.time()
        merges = bpe_train(documents, rounds=rounds, word_counts_df=wc)
        t["merge_rounds"] = round(time.time() - t0, 3)

        spark.sparkContext.setJobDescription(f"bpe probe rep{rep}: token counts")
        t0 = time.time()
        bpe_token_counts(documents, merges).agg(F.sum("n_tokens")).collect()
        t["token_counts"] = round(time.time() - t0, 3)
        t["total"] = round(
            t["word_counts"] + t["merge_rounds"] + t["token_counts"], 3
        )
        spark.sparkContext.setJobDescription(None)
        print(json.dumps(t), flush=True)


if __name__ == "__main__":
    main()
