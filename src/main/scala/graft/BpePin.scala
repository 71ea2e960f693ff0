package graft

/** Regenerates the pinned BPE merge-table + vocabulary literals that q91
  * embeds (and whose DuckDB oracle replays). Like GoldenCounts, run ONLY
  * when the learning config or the learn-time fixture changes
  * intentionally — the q91 literals and the BpeSpec learn-equality check
  * both pin this output.
  * Usage: sbt "runMain graft.BpePin /root/testdata/sf0.001 24"
  */
object BpePin {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val numMerges = args(1).toInt
    val spark = GraftSession.build(8, "graft-bpe-pin")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.documents(spark, sfDir)
    val merges = graft.ops.Export.bpeLearn(docs, "text", numMerges)
    val vocab = graft.ops.Export.bpeVocab(docs, "text", merges)
    def esc(s: String) = s.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case c if c < ' ' || c > '~' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    println("  val BpeMerges: Seq[(String, String)] = Seq(")
    println(merges.map { case (x, y) => s"""    ("${esc(x)}", "${esc(y)}")""" }
      .mkString(",\n"))
    println("  )")
    println("  val BpeVocabLit: Seq[(String, Long)] = Seq(")
    println(vocab.map { case (s, i) => s"""    ("${esc(s)}", ${i}L)""" }
      .mkString(",\n"))
    println("  )")
    spark.stop()
  }
}
