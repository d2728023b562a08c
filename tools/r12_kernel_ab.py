"""A/B the MinHash/SimHash signature kernels (VERDICT r11 #4): the
ArrowEvalPython pandas_udf (current default) vs JVM-only expression
formulations, on the real sf corpus with the real upstream pipeline
(spread → shingle → hash → collapse), interleaved median-of-N with a
noop sink so the comparison is bench-methodology.

Variants:
  minhash:  udf   — _minhash_np_udf (numpy per row, Arrow boundary)
            exprN — k separate array_min(transform(...)) columns
            exprT — one transform over a literal array<struct<a,b>>
                    of the perm params (the VERDICT-suggested shape),
                    with the mod-P reduction hoisted to ONE pass
  simhash:  udf   — _simhash_np_udf
            expr  — the 60-bit aggregate/getbit fold (dedup.simhash)

Usage: python tools/r12_kernel_ab.py [reps] ;  SPARK_GRAFT_SF_DIR env.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from thundercats_spark.operators import dedup
    from thundercats_spark.session import get_spark

    spark = get_spark("kernel-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # the exact upstream the miners run: spread + shingle-hash + collapse
    sh = dedup.ensure_parallelism(docs).select(
        F.col("doc_id").alias("id"),
        F.array_distinct(
            dedup.shingle_hashes(dedup.word_shingles(F.col("text"), 3))
        ).alias("hs"),
    )
    groups = dedup._collapse_groups(
        sh.withColumn("__gfp", F.xxhash64(F.array_sort("hs"))), "__gfp"
    )
    base = groups.select(F.col("rep").alias("id"), "hs").localCheckpoint()

    k, seed = 64, 42
    params = dedup._perm_params(k, seed)
    P = dedup._P

    def minhash_exprT(hs_col):
        prm = F.array(
            *[
                F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
                for a, b in params
            ]
        )
        # one mod-P pass over the shingles, shared by all k perms
        return F.transform(
            prm,
            lambda p: F.array_min(
                F.transform(
                    hs_col, lambda h: F.pmod(p["a"] * h + p["b"], F.lit(P))
                )
            ),
        )

    variants = {
        "minhash_udf": lambda: dedup.minhash_signature_fast(base, "hs", k, seed)
        .select("id", "sig"),
        "minhash_exprN": lambda: base.select(
            "id", dedup.minhash_signature(F.col("hs"), k, seed).alias("sig")
        ),
        "minhash_exprT": lambda: base.select(
            "id",
            minhash_exprT(
                F.transform(F.col("hs"), lambda h: F.pmod(h, F.lit(P)))
            ).alias("sig"),
        ),
        "simhash_udf": lambda: dedup.simhash_fast(
            docs.select("doc_id", "text"), "text"
        ).select("doc_id", "sh"),
        "simhash_expr": lambda: docs.select(
            "doc_id", dedup.simhash(F.col("text")).alias("sh")
        ),
    }

    # equality pins first (sorted collect compare on the small sf)
    eq_pairs = [("minhash_udf", "minhash_exprN"), ("minhash_udf", "minhash_exprT"),
                ("simhash_udf", "simhash_expr")]
    for a, b in eq_pairs:
        ra = sorted(map(tuple, variants[a]().collect()))
        rb = sorted(map(tuple, variants[b]().collect()))
        # minhash rows: (id, list) — normalize lists
        ra = [(r[0], tuple(r[1]) if isinstance(r[1], list) else r[1]) for r in ra]
        rb = [(r[0], tuple(r[1]) if isinstance(r[1], list) else r[1]) for r in rb]
        print(f"equal {a} == {b}: {ra == rb}  (n={len(ra)})")

    def run_once(fn) -> float:
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm all, then interleave reps round-robin (sandbox-host-throttle
    # discipline: never compare two separate runs)
    for name, fn in variants.items():
        run_once(fn)
    samples: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            samples[name].append(run_once(fn))
    for name, ss in samples.items():
        ss = sorted(ss)
        print(f"{name}: med {ss[len(ss)//2]:.3f}s  all {[round(x,3) for x in ss]}")


if __name__ == "__main__":
    main()
