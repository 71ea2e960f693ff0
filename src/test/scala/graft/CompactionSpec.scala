package graft

import java.nio.file.{Files, Paths}

import graft.sinks.Compaction
import org.apache.spark.sql.functions._

/** Small-files compaction: fragmentation goes away, data does not, and the
  * sorted variant leaves files value-clustered for min/max pruning. */
class CompactionSpec extends SparkSpec {

  test("compactParquetDir: fewer files, identical data, clustered when sorted") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact").resolve("t").toString
    // Fragmented write: 64 splinter files.
    spark.range(0, 20000, 1, 64)
      .select(col("id"), (col("id") % 97).as("k"))
      .write.parquet(dir)
    val before = Compaction.parquetFileCount(Paths.get(dir))
    assert(before >= 32, s"fixture not fragmented: $before files")
    val beforeSum = spark.read.parquet(dir).agg(sum("id"), count(lit(1)))
      .as[(Long, Long)].head()

    // Target = half the current bytes -> exactly 2 files.
    val bytes = Compaction.parquetBytes(Paths.get(dir))
    val n = Compaction.compactParquetDir(spark, dir, targetBytes = (bytes + 1) / 2,
      sortCols = Seq("id"))
    assert(n == 2)
    assert(Compaction.parquetFileCount(Paths.get(dir)) == 2)

    // Content identical.
    val after = spark.read.parquet(dir)
    assert(after.agg(sum("id"), count(lit(1))).as[(Long, Long)].head() == beforeSum)

    // Range-clustered: the two files' id ranges must not overlap.
    val ranges = after
      .select(input_file_name().as("f"), col("id"))
      .groupBy("f").agg(min("id").as("lo"), max("id").as("hi"))
      .orderBy("lo")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length == 2)
    assert(ranges(0)._2 < ranges(1)._1,
      s"files overlap on the sort key: $ranges")
  }
}
