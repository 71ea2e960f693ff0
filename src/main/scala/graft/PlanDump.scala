package graft

/** Plan-audit aid: prints the formatted physical plan of named queries
  * (all when none given) — the `.explain("formatted")` loop the build
  * rules demand, runnable per-query without touching the bench.
  * Usage: sbt "runMain graft.PlanDump <sfDir> [q01_agg,q02_...]" */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val spark = GraftSession.build(4, "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
        catch { case e: Throwable => println(s"FAILED: ${e.getMessage}") }
      }
    spark.stop()
  }
}
