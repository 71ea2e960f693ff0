package graft

import java.nio.file.Files

import graft.sinks.Compaction
import org.apache.spark.sql.functions._

/** Small-files compaction: fragmentation goes away, data does not, and the
  * sorted variant leaves files value-clustered for min/max pruning. All
  * paths go through the Hadoop FileSystem API (resolved per-URI), so the
  * same code serves hdfs:// on a cluster; here it's exercised through both
  * a bare path and an explicit file:// URI. */
class CompactionSpec extends SparkSpec {

  test("compactParquetDir: fewer files, identical data, clustered when sorted") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact").resolve("t").toString
    // Fragmented write: 64 splinter files.
    spark.range(0, 20000, 1, 64)
      .select(col("id"), (col("id") % 97).as("k"))
      .write.parquet(dir)
    val before = Compaction.parquetFileCount(spark, dir)
    assert(before >= 32, s"fixture not fragmented: $before files")
    val beforeSum = spark.read.parquet(dir).agg(sum("id"), count(lit(1)))
      .as[(Long, Long)].head()

    // Target = half the current bytes -> exactly 2 files.
    val bytes = Compaction.parquetBytes(spark, dir)
    val n = Compaction.compactParquetDir(spark, dir, targetBytes = (bytes + 1) / 2,
      sortCols = Seq("id"))
    assert(n == 2)
    assert(Compaction.parquetFileCount(spark, dir) == 2)

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

  test("compactParquetDir over an explicit file:// URI (Hadoop FS path)") {
    import spark.implicits._
    val local = Files.createTempDirectory("compact-uri").resolve("t")
    val uri = "file://" + local.toString
    spark.range(0, 5000, 1, 16).write.parquet(uri)
    assert(Compaction.parquetFileCount(spark, uri) == 16)
    val beforeSum = spark.read.parquet(uri).agg(sum("id")).as[Long].head()

    val bytes = Compaction.parquetBytes(spark, uri)
    assert(bytes > 0)
    val n = Compaction.compactParquetDir(spark, uri, targetBytes = bytes * 2)
    assert(n == 1)
    assert(Compaction.parquetFileCount(spark, uri) == 1)
    assert(spark.read.parquet(uri).agg(sum("id")).as[Long].head() == beforeSum)
    // Swap left no temp/backup siblings behind.
    assert(!Files.exists(local.resolveSibling("t._compact_tmp")))
    assert(!Files.exists(local.resolveSibling("t._compact_old")))
  }

  test("compactPartitionedParquetDir: per-partition compaction keeps the layout") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact-part").resolve("t").toString
    spark.range(0, 9000, 1, 12)
      .select(col("id"), (col("id") % 3).as("p"))
      .write.partitionBy("p").parquet(dir)
    assert(Compaction.parquetFileCount(spark, dir) >= 30) // ~12 per partition
    val beforeSum = spark.read.parquet(dir).agg(sum("id")).as[Long].head()

    val n = Compaction.compactPartitionedParquetDir(spark, dir,
      targetBytes = Long.MaxValue)
    assert(n == 3) // one file per partition
    assert(Compaction.parquetFileCount(spark, dir) == 3)
    // Partition layout intact: pruning still works and content unchanged.
    val back = spark.read.parquet(dir)
    assert(back.agg(sum("id")).as[Long].head() == beforeSum)
    assert(back.where(col("p") === 1).count() == 3000)
    assert(Files.isDirectory(java.nio.file.Paths.get(dir, "p=1")))
  }

  test("compactPartitionedParquetDir: multi-level layout compacts at the " +
      "LEAF level, both partition columns survive") {
    import spark.implicits._
    // dt=…/hr=… — compacting at the first level would inline `hr` into the
    // data files and silently destroy second-level pruning.
    val dir = Files.createTempDirectory("compact-part2").resolve("t").toString
    spark.range(0, 8000, 1, 8)
      .select(col("id"), (col("id") % 2).as("dt"), (col("id") % 4).as("hr"))
      .write.partitionBy("dt", "hr").parquet(dir)
    val beforeSum = spark.read.parquet(dir).agg(sum("id")).as[Long].head()

    val n = Compaction.compactPartitionedParquetDir(spark, dir,
      targetBytes = Long.MaxValue)
    assert(n == 4) // leaf partitions: dt=0/hr={0,2}, dt=1/hr={1,3}
    assert(Compaction.parquetFileCount(spark, dir) == 4)
    val back = spark.read.parquet(dir)
    assert(back.agg(sum("id")).as[Long].head() == beforeSum)
    // BOTH partition levels still prune (hr stayed a directory column, so
    // the leaf dirs still exist and the data files carry no hr column).
    assert(back.where(col("dt") === 0 && col("hr") === 2).count() == 2000)
    assert(Files.isDirectory(java.nio.file.Paths.get(dir, "dt=0", "hr=2")))
    assert(!spark.read.parquet(s"$dir/dt=0/hr=2").columns.contains("hr"))
  }
}
