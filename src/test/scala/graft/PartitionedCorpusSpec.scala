package graft

import org.apache.spark.sql.functions._

/** Partitioned corpus layout: documents written partitionBy(lang) must
  * plan per-language reads with PARTITION PRUNING (PartitionFilters at the
  * scan, untouched directories never listed in the read) — the difference
  * between scanning one language's shard and scanning 100 TB. */
class PartitionedCorpusSpec extends SparkSpec {

  test("partitionBy(lang) write -> lang filter prunes partitions at scan") {
    val out = java.nio.file.Files.createTempDirectory("corpus_part").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    // Directory layout: one subdir per language.
    val langs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langs.nonEmpty && langs.forall(_.matches("lang=[a-z]+")))
    val read = spark.read.parquet(out).where(col("lang") === "en")
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      scan.take(400))
    // Pruned read returns exactly the en docs, no residual lang filter
    // needed on data columns.
    assert(read.count() ==
      docs.where(col("lang") === "en").count())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }
}
