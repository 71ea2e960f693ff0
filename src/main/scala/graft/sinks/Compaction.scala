package graft.sinks

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-files compaction — the file-size hygiene pass every long-lived
  * 100 TB lake needs: streaming ingestion and fine-grained partitioned
  * writes accrete thousands of KB-sized parquet files, and each file costs
  * a task, a footer read, and a name-node/listing entry per downstream
  * query. Compaction rewrites a directory to ⌈bytes / targetBytes⌉ files of
  * roughly even size.
  *
  * Scale notes:
  *  - The file budget comes from the directory's ACTUAL on-disk bytes (not
  *    row counts), so compression/encoding ratios carry over to the new
  *    layout: a 10 GB dir at a 128 MB target yields ~80 files.
  *  - `sortCols` (optional) makes the rewrite a range-repartition + within-
  *    partition sort: output files are then value-clustered on those
  *    columns, so parquet min/max row-group statistics prune reads for
  *    later range predicates — compaction and clustering in one shuffle.
  *    Without `sortCols` a round-robin repartition evens out file sizes
  *    with no skew sensitivity.
  *  - The rewrite goes through a sibling temp dir then an atomic-as-
  *    possible directory swap, so a reader never sees a half-written mix
  *    of old and new files. (On an object store you'd stage to a new
  *    prefix and flip a manifest/table pointer instead; the Spark plan is
  *    identical.)
  */
object Compaction {

  /** Rewrite parquet directory `dir` into ~`targetBytes`-sized files.
    * Returns the number of files written. */
  def compactParquetDir(spark: SparkSession, dir: String, targetBytes: Long,
                        sortCols: Seq[String] = Nil): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val src = Paths.get(dir)
    val bytes = parquetBytes(src)
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(dir)
    val out =
      if (sortCols.nonEmpty) {
        val cs = sortCols.map(col)
        df.repartitionByRange(nFiles, cs: _*).sortWithinPartitions(cs: _*)
      } else df.repartition(nFiles)
    val tmp = src.resolveSibling(src.getFileName.toString + "._compact_tmp")
    out.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // Swap: old dir out of the way, tmp in, old removed.
    val old = src.resolveSibling(src.getFileName.toString + "._compact_old")
    deleteRecursively(old)
    Files.move(src, old)
    Files.move(tmp, src)
    deleteRecursively(old)
    nFiles
  }

  /** Total bytes of data files in a parquet dir (ignores _SUCCESS/.crc). */
  def parquetBytes(dir: Path): Long =
    listParquet(dir).map(p => Files.size(p)).sum

  /** Data-file count in a parquet dir. */
  def parquetFileCount(dir: Path): Int = listParquet(dir).size

  private def listParquet(dir: Path): Seq[Path] =
    Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .toSeq

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
}
