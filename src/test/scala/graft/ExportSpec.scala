package graft

import org.apache.spark.sql.functions._

/** Training-data export tier: deterministic shuffle-sharding and greedy
  * sequence packing. */
class ExportSpec extends SparkSpec {

  test("takeTokenBudget/packSequences: the fold's input plan KEEPS the " +
      "in-partition sort order (defensive sort planned as a no-op)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.{DeserializeToObjectExec, MapPartitionsExec, SortExec, SparkPlan}
    // Plan-shape assertion — AQE wraps the tree in an adaptive node that
    // hides children until execution, so build these plans without it.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = (1L to 400L).map(i => (i, i % 97, (i * 31) % 100))
        .toDF("doc_id", "toks", "score")
      /** Nodes between a fold and its data source, broadcast sides
        * excluded (the offsets subtree legitimately sorts its tiny
        * window input). */
      def streamSide(p: SparkPlan): Seq[SparkPlan] =
        if (p.getClass.getSimpleName.startsWith("BroadcastExchange")) Nil
        else p +: p.children.flatMap(streamSide)
      def foldInput(df: org.apache.spark.sql.DataFrame): SparkPlan = {
        val mps = df.queryExecution.executedPlan
          .collect { case m: MapPartitionsExec => m }
        assert(mps.nonEmpty, "expected a mapPartitions fold in the plan")
        // DeserializeToObject is the row→object adapter feeding the fold:
        // it consumes its child's iterator IN ORDER but reports no
        // outputOrdering of its own — look through it to the node whose
        // ordering the fold actually inherits.
        def through(p: SparkPlan): SparkPlan = p match {
          case d: DeserializeToObjectExec => through(d.child)
          case other => other
        }
        through(mps.head.child)
      }
      val budgetIn = foldInput(graft.ops.Export.takeTokenBudget(
        docs, "doc_id", "toks", "score", budget = 1000L))
      // The fold's direct input still carries (score desc, doc_id asc):
      // the broadcast offset join and projections preserved the range
      // sort, so the ordering survives to the iterator the fold consumes.
      val bOrd = budgetIn.outputOrdering
      assert(bOrd.size >= 2 &&
        bOrd.head.sql.toLowerCase.contains("score") &&
        bOrd.head.sql.toUpperCase.contains("DESC"),
        s"fold input lost its sort order: ${bOrd.map(_.sql)}")
      // And the defensive re-sort was REMOVED as redundant — no SortExec
      // between the fold and the persisted ranked frame on the streamed
      // side (a materialized one would mean the join stopped preserving
      // ordering — still correct, but worth failing loudly to notice).
      assert(!streamSide(budgetIn).exists(_.isInstanceOf[SortExec]),
        "defensive sort materialized: join no longer preserves ordering")
      val packIn = foldInput(graft.ops.Export.packSequences(
        docs.select("doc_id", "toks"), "doc_id", "toks",
        capacity = 50L, numShards = 4))
      val pOrd = packIn.outputOrdering
      assert(pOrd.size >= 2 &&
        pOrd.head.sql.toLowerCase.contains("shard") &&
        pOrd(1).sql.toLowerCase.contains("doc_id"),
        s"pack fold input lost its (shard, id) order: ${pOrd.map(_.sql)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("shuffleShards: balanced round-robin shards, contiguous pos, deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id")
    val out = graft.ops.Export.shuffleShards(docs, "doc_id", seed = 42L,
      numShards = 7).cache()
    try {
      assert(out.count() == 500)
      // Round-robin balance: shard sizes differ by at most 1 (500 = 7*71+3).
      val sizes = out.groupBy("shard").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(sizes.keySet == (0L until 7L).toSet)
      assert(sizes.values.max - sizes.values.min <= 1)
      // pos is a contiguous 0-based write order within each shard.
      val badPos = out.groupBy("shard")
        .agg(min("pos").as("mn"), max("pos").as("mx"),
          countDistinct("pos").as("d"), count(lit(1)).as("n"))
        .where(col("mn") =!= 0 || col("mx") =!= col("n") - 1 ||
          col("d") =!= col("n"))
      assert(badPos.isEmpty, "pos not contiguous per shard")
      // Deterministic: a second evaluation builds the identical layout.
      val again = graft.ops.Export.shuffleShards(docs, "doc_id", seed = 42L,
        numShards = 7)
      assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
      // A different seed produces a genuinely different permutation.
      val other = graft.ops.Export.shuffleShards(docs, "doc_id", seed = 7L,
        numShards = 7)
      assert(out.join(other, Seq("doc_id", "shard", "pos")).count() < 500)
    } finally { out.unpersist(); () }
  }

  test("shuffleShards: round-robin read order replays the seeded global shuffle") {
    import spark.implicits._
    val docs = (1L to 100L).toDF("doc_id")
    val out = graft.ops.Export.shuffleShards(docs, "doc_id", seed = 1L,
      numShards = 4)
    // Reading position by position across shards (pos, shard) must equal
    // the md5-key global order — the property that lets a training job
    // consume shards independently yet see the intended interleave.
    val replayed = out.orderBy("pos", "shard").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val expected = docs
      .select(col("doc_id"),
        conv(substring(md5(concat(lit("1:"), col("doc_id").cast("string"))
          .cast("binary")), 1, 15), 16, 10).cast("long").as("k"))
      .orderBy("k", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(replayed == expected)
  }

  test("packSequences: hand-checked first-fit fold incl. an oversized doc") {
    import spark.implicits._
    // One shard (numShards = 1) makes the fold order just id order:
    // tokens 60+30 fit in 100; 20 would overflow (90+20>100) -> seq 1;
    // the 250-token doc overflows anything -> its own seq 2; then 40+50
    // share seq 3; 80 overflows (90+80>100) -> seq 4.
    val docs = Seq(
      (1L, 60L), (2L, 30L), (3L, 20L), (4L, 250L), (5L, 40L), (6L, 50L),
      (7L, 80L))
      .toDF("doc_id", "n_tokens")
    val out = graft.ops.Export.packSequences(docs, "doc_id", "n_tokens",
        capacity = 100L, numShards = 1)
      .select("doc_id", "seq", "seq_offset")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      1L -> (0L, 0L), 2L -> (0L, 60L), 3L -> (1L, 0L), 4L -> (2L, 0L),
      5L -> (3L, 0L), 6L -> (3L, 40L), 7L -> (4L, 0L)), s"got $out")
  }

  test("takeTokenBudget: matches the single-task window on a multi-partition frame") {
    import spark.implicits._
    // Scrambled physical layout; the op must still produce the global
    // (score desc, id) inclusive prefix within budget.
    val df = (1L to 5000L).map(i => (i, 1L + (i * 2654435761L) % 97L,
        (i * 40503L) % 1000L))
      .toDF("id", "tokens", "score").repartition(13)
    val budget = 30000L
    val out = graft.ops.Export.takeTokenBudget(df, "id", "tokens", "score",
        budget)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // Oracle: driver-side sort + running sum.
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, sc) => (-sc, id) }
    var cum = 0L
    val expect = rows.iterator.map { case (id, tok, _) =>
      cum += tok; (id, cum)
    }.takeWhile(_._2 <= budget).toMap
    assert(out == expect, s"got ${out.size} rows, expected ${expect.size}")
    assert(out.nonEmpty && out.values.max <= budget)
    // Edge: zero budget keeps nothing; huge budget keeps everything and the
    // max cum_tokens equals the total token sum.
    assert(graft.ops.Export.takeTokenBudget(df, "id", "tokens", "score",
      0L).isEmpty)
    val all = graft.ops.Export.takeTokenBudget(df, "id", "tokens", "score",
      Long.MaxValue)
    assert(all.count() == 5000L)
    val total = df.agg(sum("tokens")).head().getLong(0)
    assert(all.agg(max("cum_tokens")).head().getLong(0) == total)
  }

  test("packSequences: packing laws on real data (fill bound, contiguous offsets, determinism)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), length(col("text")).cast("long").as("n_tokens"))
    val out = graft.ops.Export.packSequences(docs, "doc_id", "n_tokens",
      capacity = 2048L, numShards = 16).cache()
    try {
      assert(out.count() == 500)
      // Law 1: no multi-doc sequence exceeds capacity (a single oversized
      // doc may; none exist at this capacity).
      val over = out.groupBy("shard", "seq")
        .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n"))
        .where(col("fill") > 2048 && col("n") > 1)
      assert(over.isEmpty, "multi-doc sequence over capacity")
      // Law 2: within a sequence, offsets are the exclusive running sum of
      // tokens in id order — doc k's offset equals the sum of tokens of
      // docs before it.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("shard", "seq").orderBy("doc_id")
      val badOff = out.withColumn("_expect",
          coalesce(sum("n_tokens").over(w.rowsBetween(
            Window.unboundedPreceding, -1)), lit(0L)))
        .where(col("seq_offset") =!= col("_expect"))
      assert(badOff.isEmpty, "seq_offset is not the running token sum")
      // Law 3: seq ids are contiguous from 0 per shard.
      val badSeq = out.groupBy("shard")
        .agg(min("seq").as("mn"), max("seq").as("mx"),
          countDistinct("seq").as("d"))
        .where(col("mn") =!= 0 || col("d") =!= col("mx") + 1)
      assert(badSeq.isEmpty, "seq ids not contiguous per shard")
      // Law 4: greedy tightness — consecutive sequences can't be merged:
      // the first doc of seq k+1 would overflow seq k's fill.
      val fills = out.groupBy("shard", "seq").agg(sum("n_tokens").as("fill"))
      val firstNext = out.groupBy("shard", "seq")
        .agg(min(struct(col("doc_id"), col("n_tokens"))).as("f"))
        .select(col("shard"), (col("seq") - 1).as("seq"),
          col("f.n_tokens").as("next_tok"))
        .where(col("seq") >= 0)
      val mergeable = fills.join(firstNext, Seq("shard", "seq"))
        .where(col("fill") + col("next_tok") <= 2048)
      assert(mergeable.isEmpty, "a sequence boundary was not forced")
      // Determinism: identical layout on re-evaluation.
      val again = graft.ops.Export.packSequences(docs, "doc_id", "n_tokens",
        capacity = 2048L, numShards = 16)
      assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    } finally { out.unpersist(); () }
  }

  test("vocabEncode: rank-ordered ids, OOV hash fallback, order preserved, empty docs") {
    import spark.implicits._
    import java.security.MessageDigest
    // Counts: b=4, a=3, c=2, rare1=1, rare2=1. vocabSize=3 -> vocab by
    // (count desc, token asc): b=0, a=1, c=2; rare* are OOV.
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "b c rare1 b"),
      (3L, "c a rare2"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = graft.ops.Export.vocabEncode(docs, "doc_id", "text",
      vocabSize = 3, oovBuckets = 16).orderBy("doc_id").collect()
    def oov(tok: String): Long = {
      val h = java.lang.Long.parseLong(
        MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15), 16)
      3L + h % 16
    }
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 4L), (2L, 4L), (3L, 3L), (4L, 0L)))
    assert(out(0).getSeq[Long](2) == Seq(1L, 0L, 1L, 0L))
    assert(out(1).getSeq[Long](2) == Seq(0L, 2L, oov("rare1"), 0L))
    assert(out(2).getSeq[Long](2) == Seq(2L, 1L, oov("rare2")))
    assert(out(3).getSeq[Long](2).isEmpty)
    // Layout-invariant: identical encoding from a scrambled layout.
    val a = graft.ops.Export.vocabEncode(docs, "doc_id", "text", 3, 16)
    val b = graft.ops.Export.vocabEncode(docs.repartition(5), "doc_id", "text", 3, 16)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
