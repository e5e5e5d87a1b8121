#!/usr/bin/env python3
"""PySpark mapInPandas bridge for the graft Embedder contract.

Serves graft.wiki.Kb.BatchEmbedder.Hashing from PYTHON, bit-for-bit:
java String.hashCode over UTF-16 code units, floorMod dimension/sign
pick, float32 accumulation, float64 norm, float32 store. The Scala spec
(graft.wiki.PyBridgeSpec) runs this script against a documents slice
and asserts EXACT float equality with the JVM embedder — proving the
BatchModel seam composes across the JVM/Python boundary with the real
mapInPandas plumbing (schema, arrow batches, partitioned narrow stage),
which is the shape a spaCy/ONNX model plugs into.

Usage: embedder_bridge_demo.py <in_parquet> <out_parquet> [dim]
Input needs (doc_id: long, text: string); output is
(doc_id: long, vector: array<float>).

Demo/verification tool only — the Scala library itself stays pure-JVM.
"""
import math
import re
import sys

# ASCII flag: java \W is [^a-zA-Z0-9_] (no UNICODE_CHARACTER_CLASS),
# python \W is unicode-aware by default — they must split identically
TOKEN = re.compile(r"\W+", re.ASCII)


def jhash(s: str) -> int:
    """java String.hashCode: h = 31*h + unit over UTF-16 code units,
    wrapping at 32 bits (signed)."""
    h = 0
    b = s.encode("utf-16-be")
    for i in range(0, len(b), 2):
        h = (31 * h + ((b[i] << 8) | b[i + 1])) & 0xFFFFFFFF
    return h - 0x100000000 if h >= 0x80000000 else h


def embed(text, dim: int):
    import numpy as np

    v = np.zeros(dim, dtype=np.float32)
    if text is not None:
        for tok in TOKEN.split(text.lower()):
            if tok:
                h = jhash(tok)
                # python % / >> are floorMod / arithmetic shift — the
                # same semantics as java's Math.floorMod and int >>
                v[h % dim] += np.float32(1.0 if ((h >> 16) % 2) == 0 else -1.0)
    # JVM: sqrt of float64 sum IN ARRAY ORDER, then float64 divide,
    # then float32 store — replicate the order, no numpy pairwise sum
    n = 0.0
    for x in v:
        n += float(x) * float(x)
    n = math.sqrt(n)
    if n > 0:
        return [np.float32(float(x) / n) for x in v]
    return [np.float32(x) for x in v]


def main():
    in_path, out_path = sys.argv[1], sys.argv[2]
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("graft-embedder-bridge")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    def embed_batches(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "vector": [embed(t, dim) for t in pdf["text"]],
                }
            )

    (
        spark.read.parquet(in_path)
        .select("doc_id", "text")
        .repartition(2)
        .mapInPandas(embed_batches, schema="doc_id long, vector array<float>")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    spark.stop()


if __name__ == "__main__":
    main()
