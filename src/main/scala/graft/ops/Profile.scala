package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact data profiling — per-column non-null/null/distinct counts and
  * min/max (rendered as strings so one long-format schema fits any column
  * type). The whole profile is ONE aggregation pass over the table
  * (Catalyst plans the multi-distinct via Expand with partial aggregation);
  * no collect, no per-column scans — profiling 100 TB costs one scan. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"__n_$c"),
      count_distinct(col(c)).as(s"__d_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"),
          col(s"__n_$c").as("n_nonnull"),
          (col("__total") - col(s"__n_$c")).as("n_null"),
          col(s"__d_$c").as("n_distinct"),
          col(s"__mn_$c").as("min_str"),
          col(s"__mx_$c").as("max_str"))
      }: _*)).as("p"))
      .select("p.*")
  }

  /** Join-key skew profile — the pre-join audit a 100 TB pipeline runs
    * BEFORE keying a shuffle on a column: the heaviest `topK` keys with
    * their exact counts and integer-ppm share of all rows. A key holding
    * >1–5% of a large table is the salting/AQE-skew-join trigger
    * ([[graft.ops.Ops.saltedJoin]] is the repo's remedy; this op says
    * WHEN to reach for it and for WHICH keys). NULL keys profile as a
    * key like any other (they hash to one partition too — the classic
    * silent skew).
    *
    * Scale shape: one map-side-combined count aggregate (distinct-key-
    * sized) + the salted two-phase top-k ([[graft.ops.Sampling
    * .topKPerStratum]], single stratum) + a one-row total broadcast —
    * no window ever sees more than topK·fanout rows. Output:
    * (key STRING, cnt BIGINT, share_ppm BIGINT, rank INT) ordered by
    * rank. */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    require(topK > 0, "keySkew: topK must be positive")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("_tot"))
    val top = graft.ops.Sampling.topKPerStratum(
      counts.withColumn("_g", lit(0)), "_g", "key", topK,
      Seq(col("cnt").desc)).drop("_g")
    top.crossJoin(broadcast(total))
      .withColumn("share_ppm",
        floor(col("cnt").cast("decimal(38,0)") * lit(1000000L) / col("_tot"))
          .cast("long"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("key").asc)).cast("int"))
      .select(col("key"), col("cnt"), col("share_ppm"), col("rank"))
  }

  /** Vocabulary-growth curve (the Heaps'-law audit): new distinct terms
    * contributed by each id-ordered ingestion bucket, plus the running
    * total — a corpus-health monitor with teeth: healthy natural-language
    * crawl grows vocabulary ~n^β (β≈0.5); a FLAT new-terms tail means the
    * crawl is re-ingesting what it already has (dedup upstream is
    * failing), a LINEAR tail means unbounded junk tokens (spam,
    * serialized ids, parser breakage) — both visible per bucket before
    * any model is trained on it.
    *
    * A term's bucket is its FIRST occurrence (min doc id — a pure
    * function of the corpus, retry/layout/engine-stable). Scale shape:
    * one token-keyed min aggregate (vocabulary-shaped, map-side
    * combined) + one map-side-combined per-bucket token count; the final
    * join + running-total window touch only bucket-count rows (the
    * bounded-unpartitioned-window contract). Output: (bucket, n_tokens,
    * new_terms, cum_terms), one row per non-empty bucket. */
  def vocabularyGrowth(docs: DataFrame, idCol: String, textCol: String,
                       bucketSize: Long): DataFrame = {
    require(bucketSize > 0, "vocabularyGrowth: bucketSize must be positive")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("_id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("_tok"))
      .where(col("_tok") =!= "")
    val perBucket = toks
      .groupBy(expr(s"_id div ${bucketSize}L").as("bucket"))
      .agg(count(lit(1)).as("n_tokens"))
    val newTerms = toks.groupBy(col("_tok")).agg(min(col("_id")).as("_first"))
      .groupBy(expr(s"_first div ${bucketSize}L").as("bucket"))
      .agg(count(lit(1)).as("new_terms"))
    perBucket.join(newTerms, Seq("bucket"), "left")
      .withColumn("new_terms", coalesce(col("new_terms"), lit(0L)))
      .withColumn("cum_terms", sum(col("new_terms")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
