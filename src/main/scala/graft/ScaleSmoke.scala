package graft
import org.apache.spark.sql.functions._
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(32, "scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // 100k docs: 10k templates x 10 mutated near-dup variants each.
    val docs = spark.range(100000).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 40).map(i =>
          concat(lit(s"tok$i"), ((col("id") / 10) * 31 + i) % 997)): _*)
        .as("base"))
      .select(col("doc_id"),
        // variant: append a per-doc suffix to ~half the docs so each
        // template cluster has both exact-near dups and spoilers
        when(col("doc_id") % 10 < 5, col("base"))
          .otherwise(concat(col("base"), lit(" uniq"), col("doc_id"))).as("text"))
    docs.write.mode("overwrite").parquet("/tmp/scale_docs")
    val d = spark.read.parquet("/tmp/scale_docs")
    val t0 = System.nanoTime()
    val n = graft.ops.Dedup.minHashLshPairs(d, "doc_id", "text",
      shingleN = 8, k = 64, bands = 16, rows = 4, threshold = 0.8).count()
    println(f"minhash_lsh_100k: pairs=$n time=${(System.nanoTime()-t0)/1e9}%.1f s")
    val t1 = System.nanoTime()
    val n2 = graft.ops.Dedup.simHashPairs(d, "doc_id", "text", maxHamming = 3).count()
    println(f"simhash_100k: pairs=$n2 time=${(System.nanoTime()-t1)/1e9}%.1f s")
    spark.stop()
  }
}
