package graft

/** TEMPORARY r20 plan dumper — deleted before commit. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args(3).split(",").toSet
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.build(4, "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.filter(q => names.contains(q._1)).foreach {
      case (name, fn) =>
        try {
          val qe = fn(spark, sfDir).queryExecution
          java.nio.file.Files.writeString(
            outDir.resolve(s"$name$suffix.txt"),
            qe.explainString(
              org.apache.spark.sql.execution.FormattedMode) + "\n")
          println(s"[dump] $name ok")
        } catch { case e: Throwable => println(s"[dump] $name FAILED: $e") }
    }
    spark.stop()
  }
}
