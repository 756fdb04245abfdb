import sys
sys.path.insert(0, "/root/repo")
from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
from comp5339dataengineering_realtimefuelanalysis_spark.operators import quantization as qz, text as tx, similarity as sim
from pyspark.sql import functions as F

spark = get_spark("pqprune", master="local[8]", shuffle_partitions=8)
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id","text")
emb = tx.embed_text(docs, dim=64, seed="e").persist()
n = emb.count()
M, KS = 8, 64
books = qz.pq_train(emb, m=M, ks=KS, iters=2, id_col="doc_id", dim=64).persist()
codes = qz.pq_encode(emb, books, m=M, id_col="doc_id", dim=64).persist()
cents = sim.kmeans_train_centroids(emb, k=32, iters=2, id_col="doc_id", unit_norm=True).persist()
asg = sim.kmeans_assign(emb, cents, id_col="doc_id", dim=64).select("doc_id","cluster_id","embedding")
sc = asg.select("doc_id","cluster_id", sim.scaled_vec(F.col("embedding")).alias("svec"))
sc = sc.withColumn("norm", F.sqrt(sim.dot_scaled(F.col("svec"), F.col("svec")).cast("double"))).persist()

d = 64 // M
# per-doc residual norm (rounded UP for soundness)
sub = qz._sub_slices(emb, ["doc_id"], "embedding", M, 64)
res = (sub.join(codes, ["doc_id","sub"]).join(books.withColumnRenamed("cid","code"), ["sub","code"])
       .select("doc_id", sim.l2sq_scaled_unrolled(F.col("svec"), F.col("c_svec"), d, long_acc=True).alias("r2"))
       .groupBy("doc_id").agg(F.sum("r2").alias("r2"))
       .select("doc_id", F.ceil(F.sqrt(F.col("r2").cast("double"))).cast("double").alias("resid"))).persist()

# within-cell pairs: exact cos + ADC dot (q . c(x))
a = sc.select(F.col("doc_id").alias("ia"), F.col("cluster_id").alias("cell"), F.col("svec").alias("sa"), F.col("norm").alias("na"))
b = sc.select(F.col("doc_id").alias("ib"), F.col("cluster_id").alias("cell"), F.col("svec").alias("sb"), F.col("norm").alias("nb"))
pairs = a.join(b, "cell").filter(F.col("ia") < F.col("ib"))
exact = pairs.select("ia","ib","na","nb", sim.dot_scaled(F.col("sa"), F.col("sb")).cast("double").alias("dot"))
# adc dot: sum over subs of q_sub . book[sub, code_b]
qsub = qz._sub_slices(emb, ["doc_id"], "embedding", M, 64).withColumnRenamed("doc_id","ia").withColumnRenamed("svec","qs")
lut = qsub.join(F.broadcast(books), "sub").select("ia","sub",F.col("cid").alias("code"),
      sim.dot_scaled(F.col("qs"), F.col("c_svec")).cast("double").alias("pd"))
adc = (pairs.select("ia","ib").join(codes.withColumnRenamed("doc_id","ib"), "ib")
       .join(lut, ["ia","sub","code"]).groupBy("ia","ib").agg(F.sum("pd").alias("adc_dot")))
j = (exact.join(adc, ["ia","ib"])
     .join(res.withColumnRenamed("doc_id","ib").withColumnRenamed("resid","rb"), "ib"))
j = j.select("ia","ib",
    (F.col("dot")/(F.col("na")*F.col("nb"))).alias("cos"),
    ((F.col("adc_dot") + F.col("na")*F.col("rb"))/(F.col("na")*F.col("nb")) + F.lit(1e-9)).alias("cos_ub"))
THRESH = 0.9
tot = j.count()
pruned = j.filter(F.col("cos_ub") < THRESH).count()
false_prune = j.filter((F.col("cos_ub") < THRESH) & (F.col("cos") >= THRESH)).count()
hits = j.filter(F.col("cos") >= THRESH).count()
print(f"n={n} pairs={tot} pruned={pruned} ({100*pruned/tot:.1f}%) false_prune={false_prune} true_hits={hits}")
for t in (0.6, 0.75):
    p = j.filter(F.col("cos_ub") < t).count()
    fp = j.filter((F.col("cos_ub") < t) & (F.col("cos") >= t)).count()
    print(f"thresh={t}: pruned {100*p/tot:.1f}% false_prune={fp}")
