package graft

/** Regenerates the pinned unigram-LM piece-table literals that q93 embeds
  * (and whose DuckDB oracle replays). Like BpePin/GoldenCounts, run ONLY
  * when the fit config or the learn-time fixture changes intentionally.
  * Usage: sbt "runMain graft.UnigramPin /root/testdata/sf0.001 48"
  */
object UnigramPin {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val vocabSize = args(1).toInt
    val spark = GraftSession.build(8, "graft-unigram-pin")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.documents(spark, sfDir)
    val pieces = graft.ops.Unigram.unigramFit(docs, "text", vocabSize)
    def esc(s: String) = s.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case c if c < ' ' || c > '~' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    println("  val UnigramPieces: Seq[(String, Long, Long)] = Seq(")
    println(pieces.map { case (p, id, sc) =>
      s"""    ("${esc(p)}", ${id}L, ${sc}L)""" }.mkString(",\n"))
    println("  )")
    spark.stop()
  }
}
