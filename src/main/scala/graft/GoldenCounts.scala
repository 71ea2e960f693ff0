package graft
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Regenerates the golden per-query row counts that SparkEntrySpec pins.
  * Usage: sbt "runMain graft.GoldenCounts /root/testdata/sf0.001
  *   src/test/resources/golden_counts_sf0.001.tsv"
  * Run this ONLY when a query's result shape changes intentionally; the
  * spec failing without such a change means a wrong-result regression. */
object GoldenCounts {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args
    val spark = GraftSession.build(4, "graft-golden")
    spark.sparkContext.setLogLevel("WARN")
    val lines = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      s"$name\t${fn(spark, sfDir).count()}"
    }
    Files.write(Paths.get(outFile), lines.asJava)
    spark.stop()
  }
}
