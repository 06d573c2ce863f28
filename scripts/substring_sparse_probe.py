"""Sparse-duplicate scale probe for exact_substring_spans.

The shared textops corpus (20-word vocab) SATURATES the op — every
4-gram is duplicated, so the island windows shuffle every position and
the measured 22.4k docs/s at 1M is the worst case. Real corpora are
the opposite: duplicated spans are rare, and the op's 100-TB story
("the window stages run over ONLY the duplicated positions") rests on
that sparsity. This probe synthesizes the sparse regime and pins the
closed form:

- 50 words per doc drawn from a 50,021-word hash vocab → 4-gram space
  ~50021^4, natural cross-doc collisions ~0;
- every 100th doc gets a literal 10-word chunk spliced at word 20
  (disjoint from the hash vocab), the corpus's ONLY duplicated text;
- the words flanking the splice (positions 19 and 30) are DOC-UNIQUE
  sentinels ('u<id>l' / 'u<id>r') in every doc, so boundary-crossing
  grams can never duplicate — without them the single-hash-word
  boundary grams birthday-collide across the 10k injected docs
  (measured: 3146 of 10000 spans extended by one word at 1M docs,
  matching the 1-(1-e^-0.2)^2 prediction — a probe-design artifact
  the first cut of this closed form missed, not an operator bug);
- expected output: injected docs have exactly one merged span of 10
  duplicated words (the 7 fully-interior gram positions 20..26 merge
  to [20, 29]), every other doc has zero — up to ~47M²/2/50021⁴ ≈
  2e-4 expected natural 4-gram collisions among the hash words, so
  the cold-doc assert carries a slack of 2.

Usage: python scripts/substring_sparse_probe.py [N]  (default 1000000)
Writes BENCH/substring_sparse_probe.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapshaper_spark import queries as Q
from mapshaper_spark.session import get_spark

HOT = "the quick brown fox jumps over the lazy dog again"  # 10 words


def synth(spark, n: int, path: str) -> None:
    base = (
        "concat_ws(' ', transform(sequence(0, 49), j -> "
        "CASE WHEN j = 19 THEN concat('u', CAST(id AS STRING), 'l') "
        "WHEN j = 30 THEN concat('u', CAST(id AS STRING), 'r') "
        "ELSE concat('w', CAST(pmod(hash(id, j), 50021) AS STRING)) END))"
    )
    words = (
        f"CASE WHEN id % 100 = 0 THEN concat_ws(' ', "
        f"array_join(slice(split({base}, ' '), 1, 20), ' '), '{HOT}', "
        f"array_join(slice(split({base}, ' '), 31, 20), ' ')) "
        f"ELSE {base} END"
    )
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(words).alias("text"),
        F.lit("en").alias("lang"),
        F.expr("concat('src', CAST(id % 97 AS STRING))").alias("source"),
    )
    df = df.withColumn("n_chars", F.length("text"))
    df.write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    tmp = f"/tmp/mapshaper_spark_substring_{n}"
    spark = get_spark("substring-sparse-probe", cpus=32, shuffle_partitions=32)
    n_hot = (n + 99) // 100

    def measure(name: str) -> float:
        t0 = time.time()
        es = Q.QUERIES[name](spark, tmp)
        agg = es.agg(
            F.count("*").alias("rows"),
            F.sum("dup_spans").alias("spans"),
            F.sum("dup_words").alias("dw"),
            F.sum(
                F.when(
                    (F.col("doc_id") % 100 == 0)
                    & (
                        (F.col("dup_spans") != 1)
                        | (F.col("dup_words") != 10)
                    ),
                    1,
                ).otherwise(0)
            ).alias("bad_hot"),
            F.sum(
                F.when(
                    (F.col("doc_id") % 100 != 0)
                    & (F.col("dup_spans") != 0),
                    1,
                ).otherwise(0)
            ).alias("bad_cold"),
        ).first()
        sec = time.time() - t0
        assert agg.rows == n, (name, agg)
        assert agg.bad_hot == 0 and agg.bad_cold <= 2, (name, agg)
        assert n_hot <= agg.spans <= n_hot + 2, (name, agg)
        assert 10 * n_hot <= agg.dw <= 10 * n_hot + 16, (name, agg)
        return sec

    try:
        synth(spark, n, tmp)
        # interleaved min-of-2 A/B: the string-shuffle reference form
        # vs the xxhash64-prefilter scale path on the same corpus
        times: dict[str, list[float]] = {"ref": [], "hashed": []}
        for _ in range(2):
            times["ref"].append(measure("exact_substring_spans"))
            times["hashed"].append(
                measure("exact_substring_spans_hashed")
            )
        ref = round(min(times["ref"]), 2)
        hsh = round(min(times["hashed"]), 2)
        out = {
            "n_docs": n,
            "n_injected": n_hot,
            "sparse_spans_sec": ref,
            "sparse_spans_docs_per_sec": int(n / max(ref, 1e-9)),
            "sparse_spans_hashed_sec": hsh,
            "sparse_spans_hashed_docs_per_sec": int(n / max(hsh, 1e-9)),
            "all_runs_sec": {
                k: [round(v, 2) for v in vs] for k, vs in times.items()
            },
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "substring_sparse_probe.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
