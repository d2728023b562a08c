"""A/B the r1 vs r2 formulations of ngram_jaccard_pairs and simhash_pairs
at sf0.1 with warmup + median-of-3 (VERDICT r02 'What's wrong' #2)."""
import os, sys, time, json, statistics
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from thundercats_spark.operators import dedup
from thundercats_spark.session import get_spark

spark = get_spark("ab-regression")
spark.sparkContext.setLogLevel("ERROR")
d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

def jaccard_r1(df, threshold=0.5, n=3):
    sh = dedup.ensure_parallelism(df).select(
        F.col("doc_id").alias("id"),
        F.array_sort(F.array_distinct(
            F.transform(dedup.word_shingles(F.col("text"), n), lambda s: F.xxhash64(s))
        )).alias("hs"))
    prefix_len = (F.size("hs") - F.ceil(F.size("hs") * threshold) + 1).cast("int")
    posting = sh.select("id", F.explode(F.slice("hs", 1, prefix_len)).alias("shingle"))
    cand = (posting.alias("a").join(posting.alias("b"), "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")).distinct())
    sa = sh.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))
    return (cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn("jaccard", F.col("inter") / (F.size("hs_a") + F.size("hs_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard"))

def simhash_r1(df, max_hamming=3):
    h = dedup.simhash_fast(dedup.ensure_parallelism(df).select(F.col("doc_id").alias("id"), F.col("text")), "text").select("id", "sh")
    bands = h.select("id", "sh", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftright(F.col("sh"), b * 15).bitwiseAND(F.lit(0x7FFF)).alias("key"))
        for b in range(4)])).alias("bk")
    ).select("id", "sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    cand = (bands.alias("a").join(bands.alias("b"), ["band", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b")).distinct())
    return (cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming"))

variants = {
    "jaccard_r1": lambda: jaccard_r1(d),
    "jaccard_r2": lambda: dedup.ngram_jaccard_pairs(d, threshold=0.5),
    "simhash_r1": lambda: simhash_r1(d),
    "simhash_r2": lambda: dedup.simhash_pairs(d, max_hamming=3),
}
out = {}
for name, fn in variants.items():
    ts = []
    for i in range(4):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        ts.append(round(time.time() - t0, 3))
    out[name] = {"warmup": ts[0], "median": statistics.median(ts[1:]), "runs": ts[1:]}
    print(name, out[name], flush=True)
print(json.dumps(out))
