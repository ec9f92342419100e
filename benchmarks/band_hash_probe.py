"""Measure the LSH band-bucket hash shapes: xxhash64 over the band's
minhash LONGS (multi-arg, banding v2) vs xxhash64 over their
comma-joined STRINGIFIED form (banding v1) — N synthetic signature rows
x K hashes x BANDS bands, noop sink, the exact `_band_entries` shape.

Both forms induce the same candidate pairs (bucket equality == band
tuple equality, modulo ~2^-64 xxhash64 collisions that only ADD
candidates for the Jaccard verify to drop); the probe is purely about
the map-side cost of stringifying K longs per corpus row before
hashing.

Usage: python benchmarks/band_hash_probe.py [rows] [num_hashes] [bands] [reps]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from bench import make_spark  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BANDS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 3


def main():
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    r = K // BANDS
    sig = (
        spark.range(ROWS)
        .select(
            "id",
            *[
                (F.col("id") * (i * 2654435761 + 40503) % 1000003).alias(f"h{i}")
                for i in range(K)
            ],
        )
        .localCheckpoint(eager=True)
    )
    sig.count()

    def bands_expr(bucket_fmt):
        structs = ",".join(
            "named_struct('band', {b}, 'bucket', {bucket})".format(
                b=b,
                bucket=bucket_fmt(
                    [f"h{b * r + i}" for i in range(r)]
                ),
            )
            for b in range(BANDS)
        )
        return (
            sig.select("id", F.explode(F.expr(f"array({structs})")).alias("bb"))
            .select(
                "id",
                F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"),
            )
        )

    def v1(cols):  # stringify + concat + hash
        return "xxhash64(concat_ws(',', {}))".format(
            ",".join(f"CAST({c} AS STRING)" for c in cols)
        )

    def v2(cols):  # hash the longs directly
        return "xxhash64({})".format(",".join(cols))

    for name, fmt in (("v1_string", v1), ("v2_longs", v2)):
        samples = []
        for rep in range(REPS):
            spark.sparkContext.setJobDescription(f"band probe {name} rep{rep}")
            t0 = time.time()
            bands_expr(fmt).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        print(f"{name}: {samples} median={sorted(samples)[len(samples)//2]}")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
