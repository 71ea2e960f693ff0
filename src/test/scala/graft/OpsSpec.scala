package graft

import org.apache.spark.sql.functions._
import graft.ops.Ops

/** Relational operator pack specs (SURVEY.md §2.4–§2.7). */
class OpsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  test("U1 meltToLong: wide -> long via single Expand (no shuffle)") {
    import spark.implicits._
    val wide = Seq(("i1", 3.0, 2.0), ("i2", 0.0, 4.0)).toDF("item", "s114", "s123")
    val long = Ops.meltToLong(wide, Seq("item"), Seq("s114", "s123"), "store", "qty")
    assert(long.columns.toSeq == Seq("item", "store", "qty"))
    assert(long.count() == 4)
    assert(long.where($"item" === "i1" && $"store" === "s114").head.getDouble(2) == 3.0)
    // Plan check: unpivot must be an Expand, not a join/shuffle.
    assert(long.queryExecution.optimizedPlan.toString.contains("Expand"))
  }

  test("A1 groupSumDropZero: null->0 pre-agg, zero groups dropped") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("b", Some(0.0)))
      .toDF("k", "v")
    val out = Ops.groupSumDropZero(df, Seq("k"), "v", "total")
    assert(rows(out.orderBy("k")) == Seq(Seq("a", 1.0)))
  }

  test("A5 firstPerGroup: explicit order, deterministic") {
    import spark.implicits._
    val df = Seq(("g1", 2, "b"), ("g1", 1, "a"), ("g2", 5, "c")).toDF("g", "o", "v")
    val out = Ops.firstPerGroup(df, Seq("g"), Seq(col("o").asc)).orderBy("g")
    assert(rows(out) == Seq(Seq("g1", 1, "a"), Seq("g2", 5, "c")))
  }

  test("A7 distinctKeepFirst: first occurrence by order column") {
    import spark.implicits._
    val df = Seq(("po1", 3L), ("po1", 1L), ("po2", 2L)).toDF("po", "idx")
    val out = Ops.distinctKeepFirst(df, Seq("po"), "idx").orderBy("po")
    assert(rows(out) == Seq(Seq("po1", 1L), Seq("po2", 2L)))
  }

  test("O1 numericAwareSort: numeric strings by value, junk last") {
    import spark.implicits._
    val df = Seq("142", "9", "FL-DOCK", "23.5").toDF("branch")
    val out = Ops.numericAwareSort(df, "branch").collect().map(_.getString(0)).toSeq
    assert(out == Seq("9", "23.5", "142", "FL-DOCK"))
  }

  test("saltedJoin: skew-spread join equals the plain join result") {
    import spark.implicits._
    // one hot key (90% of rows) + a long tail
    val left = ((1 to 90).map(_ => ("hot", 1)) ++ (1 to 10).map(i => (s"k$i", i)))
      .toDF("k", "lv")
    val right = (Seq("hot") ++ (1 to 10).map(i => s"k$i")).zipWithIndex
      .toDF("k", "rv")
    val plain = left.join(right, Seq("k")).orderBy("k", "lv", "rv")
    val salted = Ops.saltedJoin(left, right, Seq("k"), salts = 8)
      .orderBy("k", "lv", "rv")
    assert(rows(salted) == rows(plain))
  }

  test("J1 enrichLeft: broadcast hash join in the physical plan") {
    import spark.implicits._
    val fact = Seq(("114", 3), ("999", 9)).toDF("store", "qty")
    val dim = Seq(("114", "po-1")).toDF("store", "po")
    val out = Ops.enrichLeft(fact, dim, Seq("store"))
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val got = rows(out.orderBy("store"))
    assert(got == Seq(Seq("114", 3, "po-1"), Seq("999", 9, null)))
  }

  test("O1 globalRowNumber: dense 1..n global ranks without a global window") {
    import org.apache.spark.sql.functions._
    // Many input partitions so per-partition offsets are actually exercised.
    val df = spark.range(0, 1000, 1, numPartitions = 16)
      .select((col("id") * 37 % 1000).as("k")) // a permutation of 0..999
    val out = Ops.globalRowNumber(df, Seq(col("k").asc), "rn")
    // Output must arrive ALREADY in rn order (range partitions in key
    // order, sorted within) — collect() preserves partition order, so no
    // orderBy here, deliberately.
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (0L until 1000L).map(k => (k, k + 1)))
    // Ranks come from the sorted ids, never a row_number window over the
    // whole input (the single-task 100 TB bottleneck), and the sort keys
    // are materialized columns (_gk*) so the sort comparator never
    // re-evaluates key expressions per comparison.
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("monotonically_increasing_id"))
    assert(planStr.contains("_gk0"))
    assert(!planStr.contains("row_number"))
  }

  test("globalRowNumber honors direction + null ordering of each key") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(Some(3), None, Some(1), Some(2)).toDF("k")
    val out = Ops.globalRowNumber(df, Seq(col("k").desc_nulls_last), "rn")
      .collect().map(r => (if (r.isNullAt(0)) null else r.getInt(0), r.getLong(1)))
    assert(out.toSeq == Seq((3, 1L), (2, 2L), (1, 3L), (null, 4L)))
  }

  test("O4 globalRowNumber: no row loss at sf0.01 scale through the driver's coalesce(1).write path") {
    // Round 3 regression: the counts branch (spark_partition_id) and the
    // ranked branch (monotonically_increasing_id upper bits) read the range
    // shuffle through independently planned AQE stage reads; when the
    // coalescing decisions diverged the inner pid join silently dropped
    // rows — q34 returned 30 352 of 60 000 at 32 cores. Re-run the failure
    // shape: real sf0.01 lineitem (60 000 rows), shuffle partitions well
    // above core count (maximum AQE coalescing pressure on every stage
    // read), and the driver's exact path (coalesce(1).write.parquet,
    // Verify.scala) — then assert the EXACT row count and that rn is a
    // dense 1..n permutation, not merely non-empty.
    import org.apache.spark.sql.functions._
    val conf = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "37")
      val out = SparkEntry.queries("q34_lot_sort")(spark, "/root/testdata/sf0.01")
      val dir = java.nio.file.Files.createTempDirectory("graft-q34").toString
      out.coalesce(1).write.mode("overwrite").parquet(dir)
      val back = spark.read.parquet(dir)
      assert(back.count() == 60000L)
      val a = back.agg(min("rn"), max("rn"), countDistinct("rn")).head
      assert((a.getLong(0), a.getLong(1), a.getLong(2)) == (1L, 60000L, 60000L))
    } finally spark.conf.set("spark.sql.shuffle.partitions", conf)
  }

  test("globalRowNumber plan invariants: one PINNED range exchange into a persisted frame, no full-data reshuffle") {
    // These are the shape guarantees future "optimizations" must not break:
    // (1) the range shuffle is REPARTITION_BY_NUM — the explicit partition
    //     count forbids AQE coalescing, so mono_id's upper bits are the
    //     range-bucket index;
    // (2) the sorted+ranked frame is PERSISTED and the counts come from the
    //     cached _mid column AS DATA — never from a sibling branch's
    //     physical partition ids (round 3: separate exchanges sample
    //     different range boundaries because RangePartitioner seeds with
    //     rdd.id, so sibling-branch pids silently diverge);
    // (3) the payload is shuffled exactly once — the only hash exchange in
    //     the plan is the tiny per-partition counts aggregate (on _pid);
    // (4) sort keys are materialized (_gk*) so SortExec's comparator never
    //     re-evaluates key expressions per comparison;
    // (5) ranks come from sorted ids, never a row_number window over data.
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 5000, 1, 8).select((col("id") * 37 % 5000).as("k"))
    val out = Ops.globalRowNumber(df, Seq(col("k").asc), "rn")
    out.count() // finalize the adaptive plan before asserting on it
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("rangepartitioning"), planStr.take(800))
    assert(planStr.contains("REPARTITION_BY_NUM"), planStr.take(800))
    assert(planStr.contains("InMemoryRelation"), planStr.take(800))
    val hashEx = planStr.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    // The counts aggregate's key (shiftrightunsigned(_mid,33) aliased _pid)
    // surfaces at its exchange as an extracted _groupingexpression — that
    // exchange carries one row per partition, not data.
    assert(hashEx.forall(l => l.contains("_pid") || l.contains("_groupingexpression")),
      s"full-data hash exchange crept in:\n${hashEx.mkString("\n")}")
    assert(planStr.contains("_gk0"))
    assert(!planStr.contains("row_number"))
  }

  test("J6 asofJoin: most recent at-or-before, inclusive ties, left-join nulls") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val quotes = Seq( // (key, qt, px): the right side
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 50L, 9.9)).toDF("k", "qt", "px")
    val trades = Seq( // (key, tt, id): the left side
      ("A", 5L, 1),   // before any quote -> null
      ("A", 20L, 2),  // equal time -> inclusive, px=2.0
      ("A", 25L, 3),  // between -> px=2.0
      ("A", 99L, 4),  // after all -> px=3.0
      ("B", 49L, 5),  // other key, before its quote -> null
      ("C", 1L, 6))   // key with no quotes -> null
      .toDF("k", "tt", "id")
    val out = Ops.asofJoin(trades, quotes, Seq("k"), "tt", "qt")
      .orderBy("id")
      .collect().map(r => (r.getInt(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1, null, null), (2, 20L, 2.0), (3, 20L, 2.0), (4, 30L, 3.0),
      (5, null, null), (6, null, null)))
    // Scale shape: the carry-forward window is partitioned by the key
    // (hashpartitioning on k), never a single-partition global window.
    val plan = Ops.asofJoin(trades, quotes, Seq("k"), "tt", "qt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(plan.contains("hashpartitioning(k"))
    assert(!plan.contains("SinglePartition"))
  }

  test("scan hygiene: filters push to parquet and columns prune (q02)") {
    // A declarative plan must land its literal predicate in the scan
    // (PushedFilters) and read ONLY referenced columns (ReadSchema) — the
    // difference between scanning 3 columns and all 11 of a 100 TB table.
    val plan = SparkEntry.queries("q02_group_sum_dropzero")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(scan.contains("EqualTo(l_returnflag,R)"), scan)
    val readSchema = scan.substring(scan.indexOf("ReadSchema"))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("saltedJoin: result invariant under shuffle-partition changes (retry-stable salt)") {
    import spark.implicits._
    val left = ((1 to 50).map(i => ("hot", i)) ++ (1 to 10).map(i => (s"k$i", i)))
      .toDF("k", "lv")
    val right = (Seq("hot") ++ (1 to 10).map(i => s"k$i")).zipWithIndex.toDF("k", "rv")
    def run(): Seq[Seq[Any]] =
      rows(Ops.saltedJoin(left, right, Seq("k"), salts = 8).orderBy("k", "lv", "rv"))
    val before = run()
    val conf = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      assert(run() == before)
    } finally spark.conf.set("spark.sql.shuffle.partitions", conf)
  }

  test("intervalJoin: half-open bounds, multi-bucket spans, empty intervals, no NLJ") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val points = Seq(
      (1L, 0L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 25L), (6L, 95L))
      .toDF("pid", "ts")
    val intervals = Seq(
      ("a", 10L, 20L), // picks ts=10 (inclusive start), rejects ts=20 (exclusive end)
      ("b", 15L, 35L), // spans 3 buckets at width 10; picks 19, 20, 25
      ("c", 90L, 200L), // long interval, far bucket; picks 95
      ("d", 50L, 50L), // empty: dropped
      ("e", 60L, 55L)) // inverted: dropped
      .toDF("iid", "s", "e")
    val out = Ops.intervalJoin(points, "ts", intervals, "s", "e", bucketWidth = 10L)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set(
      (2L, "a"), (3L, "a"), // 10, 19 in [10,20)
      (3L, "b"), (4L, "b"), (5L, "b"),
      (6L, "c")))
    // The scale contract: a hash equi-join on the bucket id, never a
    // nested-loop over the raw range predicate.
    val plan = Ops.intervalJoin(points, "ts", intervals, "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("intervalJoin/intervalOverlapJoin match the naive join on random data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    def iv(idp: String, m: Int) = Seq.tabulate(m) { i =>
      val s = rnd.nextInt(200).toLong
      (s"$idp$i", s, s + 1 + rnd.nextInt(40)) // width 1..40 vs bucket 16
    }
    for (trial <- 1 to 3) {
      val pts = Seq.tabulate(60)(i => (i.toLong, rnd.nextInt(220).toLong))
        .toDF("pid", "ts")
      val ivs = iv("L", 25).toDF("iid", "s", "e")
      val naive = pts.crossJoin(ivs)
        .where(col("ts") >= col("s") && col("ts") < col("e"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val got = Ops.intervalJoin(pts, "ts", ivs, "s", "e", bucketWidth = 16L)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == naive, s"intervalJoin trial $trial")

      val l = iv("L", 20).toDF("lid", "ls", "le")
      val r = iv("R", 20).toDF("rid", "rs", "re")
      val naiveO = l.crossJoin(r)
        .where(col("ls") < col("re") && col("rs") < col("le"))
        .select("lid", "rid").collect().map(x => (x.getString(0), x.getString(1))).toSet
      val gotRows = Ops.intervalOverlapJoin(l, "ls", "le", r, "rs", "re", 16L)
        .select("lid", "rid").collect().map(x => (x.getString(0), x.getString(1)))
      // Exact same pair set AND no duplicate meetings (canonical bucket).
      assert(gotRows.length == gotRows.toSet.size, s"dup pairs trial $trial")
      assert(gotRows.toSet == naiveO, s"overlap trial $trial")

      // Same answers with directBuckets forced to 2: (nearly) every
      // interval is routed through the two-stage √-split, so the long-path
      // plumbing gets full correctness coverage, not just the pathology test.
      val gotSplit = Ops.intervalJoin(pts, "ts", ivs, "s", "e",
          bucketWidth = 16L, directBuckets = 2)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(gotSplit == naive, s"intervalJoin √-split trial $trial")
      val gotOSplit = Ops.intervalOverlapJoin(l, "ls", "le", r, "rs", "re",
          bucketWidth = 16L, directBuckets = 2)
        .select("lid", "rid").collect().map(x => (x.getString(0), x.getString(1)))
      assert(gotOSplit.length == gotOSplit.toSet.size, s"split dup pairs trial $trial")
      assert(gotOSplit.toSet == naiveO, s"overlap √-split trial $trial")
    }
  }

  test("intervalJoin self-defends against a corpus-length interval") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // One interval covering the ENTIRE point domain at bucketWidth=1:
    // 1M buckets. The direct explode would build a 1M-element array in a
    // single task (the straggler the operator must defend against); the
    // √-split path runs it as two ~1k-element explodes with the chunk rows
    // redistributed — fast enough to live in the unit suite.
    val span = 1000000L
    val points = spark.range(0, span, 50000).select(
      col("id").as("pid"), col("id").as("ts"))
    val intervals = Seq(
      ("all", 0L, span), // pathological: spans every bucket
      ("tiny", 100000L, 100001L)) // typical: one bucket
      .toDF("iid", "s", "e")
    val out = Ops.intervalJoin(points, "ts", intervals, "s", "e",
        bucketWidth = 1L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1)))
    // Every point matches "all" exactly once; ts=100000 also matches "tiny".
    assert(out.count(_._2 == "all") == 20)
    assert(out.toSet.count(_._2 == "all") == 20) // no duplicate meetings
    assert(out.filter(_._2 == "tiny").toSeq == Seq((100000L, "tiny")))
  }

  test("snapshotDiff: all four statuses; multi-column fields don't smear") {
    import spark.implicits._
    val old = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"),
      (5L, "ab", "c")).toDF("id", "f1", "f2")
    val neu = Seq((1L, "a", "x"), (2L, "B", "y"), (4L, "d", "w"),
      (5L, "a", "bc")).toDF("id", "f1", "f2")
    val got = Ops.snapshotDiff(old, neu, "id", Seq("f1", "f2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added",
      // ("ab","c") vs ("a","bc"): the length-prefixed self-delimiting
      // "v<len>:<v>" encoding keeps the fingerprints distinct —
      // concatenation must not smear fields.
      5L -> "changed"))
  }

  test("sessionize: gap boundaries, ties never split, layout-invariant") {
    import spark.implicits._
    // user a: events at 0, 10, 11, 50, 60 with gap 10 -> sessions
    // {0,10,11} (10-0 == gap, NOT >), {50,60}; user b: single event.
    val ev = Seq(("a", 0L), ("a", 10L), ("a", 11L), ("a", 50L), ("a", 60L),
      ("b", 7L)).toDF("k", "ts")
    def run(parts: Int) = Ops.sessionize(ev.repartition(parts), "k", "ts",
        gap = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val got = run(3)
    assert(got == Map(("a", 0L) -> 1L, ("a", 10L) -> 1L, ("a", 11L) -> 1L,
      ("a", 50L) -> 2L, ("a", 60L) -> 2L, ("b", 7L) -> 1L))
    assert(run(1) == got, "layout must not change sessions")
    // tied timestamps land in one session even when the tie straddles
    // what would otherwise be a boundary
    val tied = Seq(("u", 0L), ("u", 100L), ("u", 100L), ("u", 100L))
      .toDF("k", "ts")
    val ts = Ops.sessionize(tied, "k", "ts", gap = 10L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ts.filter(_._1 == 100L).map(_._2).distinct.toSeq == Seq(2L))
    assert(ts.find(_._1 == 0L).get._2 == 1L)
    // gap = 0: every distinct timestamp its own session, ties merge
    val g0 = Ops.sessionize(tied, "k", "ts", gap = 0L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).distinct.sorted.toSeq
    assert(g0 == Seq((0L, 1L), (100L, 2L)))
  }

  test("sessionize plan: ONE exchange — both windows share the per-key sort") {
    import spark.implicits._
    val ev = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "ts")
      .repartition(4)
    val plan = Ops.sessionize(ev, "k", "ts", gap = 10L)
      .queryExecution.executedPlan.toString
    // the repartition(4) above is RoundRobin; the op itself must add
    // exactly one hash exchange (on the key) and no extra sort barrier
    assert(plan.split("hashpartitioning").length - 1 == 1,
      s"expected exactly one hash exchange:\n$plan")
    assert(plan.split("Window").length - 1 >= 2, "both windows present")
  }

  test("snapshotDiff: null transitions are changes, not silent matches") {
    import spark.implicits._
    // (null,"x")->("x",null) and "x"->null and null->"" must all be
    // CHANGED; (null,null)->(null,null) stays unchanged. An unsentineled
    // concat_ws would report the first three 'unchanged' (nulls skipped).
    val old = Seq((1L, Option.empty[String], Option("x")),
      (2L, Option("x"), Option("y")), (3L, Option.empty[String], Option("y")),
      (4L, Option.empty[String], Option.empty[String]))
      .toDF("id", "f1", "f2")
    val neu = Seq((1L, Option("x"), Option.empty[String]),
      (2L, Option.empty[String], Option("y")), (3L, Option(""), Option("y")),
      (4L, Option.empty[String], Option.empty[String]))
      .toDF("id", "f1", "f2")
    val got = Ops.snapshotDiff(old, neu, "id", Seq("f1", "f2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "changed", 3L -> "changed",
      4L -> "unchanged"))
    // no string value can imitate null: "n:" as DATA != null field
    val o2 = Seq((9L, Option.empty[String])).toDF("id", "f1")
    val n2 = Seq((9L, Option("n:"))).toDF("id", "f1")
    assert(Ops.snapshotDiff(o2, n2, "id", Seq("f1"))
      .head().getString(1) == "changed")
  }

  test("sessionFunnel: ordered-subsequence semantics, strict-after ties, " +
      "gap split, ppm floors") {
    import spark.implicits._
    val ev = Seq(
      // A: full chain in order
      ("A", 1L, "view"), ("A", 2L, "click"), ("A", 3L, "purchase"),
      // B: click before view doesn't count; view→click in order, no purchase
      ("B", 1L, "click"), ("B", 2L, "view"), ("B", 3L, "click"),
      // C: click at the SAME ts as view — strict-after → not chained
      ("C", 1L, "view"), ("C", 1L, "click"),
      // D: gap splits into two sessions; second has click only
      ("D", 1L, "view"), ("D", 100L, "click"))
      .toDF("k", "ts", "t")
    val got = Ops.sessionFunnel(ev, "k", "ts", "t",
        Seq("view", "click", "purchase"), gap = 10L)
      .orderBy("step_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // sessions: A, B, C, D-1, D-2 = 5 total
    assert(got.toSeq == Seq(
      (1L, "view", 4L, 800000L),
      (2L, "click", 2L, 400000L),
      (3L, "purchase", 1L, 200000L)), got.mkString(","))
  }

  test("scd2History: run-length versions, half-open intervals, null-safe " +
      "values, tie determinism") {
    import spark.implicits._
    val log = Seq(
      ("k1", 1L, Option("a")), ("k1", 2L, Option("a")),  // v1: a [1, 4)
      ("k1", 4L, Option("b")),                           // v2: b [4, 7)
      ("k1", 7L, Option.empty[String]),                  // v3: null [7, 9)
      ("k1", 9L, Option("a")),                           // v4: a [9, null)
      ("k2", 5L, Option("x"))).toDF("k", "ts", "v")
    val got = Ops.scd2History(log, "k", "ts", Seq("v"))
      .orderBy("k", "version").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("-"), r.getLong(3),
        if (r.isNullAt(5)) -1L else r.getLong(5), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("k1", 1L, "a", 1L, 4L, 2L), ("k1", 2L, "b", 4L, 7L, 1L),
      ("k1", 3L, "-", 7L, 9L, 1L), ("k1", 4L, "a", 9L, -1L, 1L),
      ("k2", 1L, "x", 5L, -1L, 1L)), got.mkString(","))
    // equal timestamps: (ts, value) ordering → layout-invariant versions
    val tied = Seq(("k", 1L, "b"), ("k", 1L, "a"), ("k", 2L, "a"))
      .toDF("k", "ts", "v")
    val a1 = Ops.scd2History(tied, "k", "ts", Seq("v"))
      .orderBy("version").collect().map(r => (r.getLong(1), r.getString(2)))
    val a2 = Ops.scd2History(tied.repartition(7), "k", "ts", Seq("v"))
      .orderBy("version").collect().map(r => (r.getLong(1), r.getString(2)))
    assert(a1.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "a")) &&
      a2.toSeq == a1.toSeq, a1.mkString(","))
  }

  test("transitionMatrix: consecutive pairs per key, row-conditional ppm, " +
      "no cross-key transitions") {
    import spark.implicits._
    val ev = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "a"), ("u1", 4L, "b"),
      ("u2", 1L, "a"), ("u2", 2L, "a"),
      ("u3", 9L, "b")) // single event: no transition
      .toDF("k", "ts", "t")
    val got = Ops.transitionMatrix(ev, "k", "t",
        Seq(col("ts").asc))
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // from a: a→b ×2 (u1), a→a ×1 (u2) → p(a→b)=666666, p(a→a)=333333
    // from b: b→a ×1 → 1000000 (u1's final b and u3's b emit nothing)
    assert(got.toSeq == Seq(
      ("a", "a", 1L, 333333L), ("a", "b", 2L, 666666L),
      ("b", "a", 1L, 1000000L)), got.mkString(","))
  }

  test("basketLift: counts, support ppm, hand-computed lift, " +
      "duplicate observations collapse") {
    import spark.implicits._
    // baskets: u1{x,y}, u2{x,y}, u3{x}, u4{y,z} (u1's x repeated)
    val df = Seq(("u1", "x"), ("u1", "x"), ("u1", "y"), ("u2", "x"),
      ("u2", "y"), ("u3", "x"), ("u4", "y"), ("u4", "z"))
      .toDF("k", "i")
    val got = Ops.basketLift(df, "k", "i")
      .orderBy("item_a", "item_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // n = 4; n_x = 3, n_y = 3, n_z = 1; xy = 2, yz = 1
    def lift(n_ab: Long, na: Long, nb: Long): Long =
      math.floor(4.0 * n_ab * 1000000.0 / (na.toDouble * nb.toDouble)).toLong
    assert(got.toSeq == Seq(
      ("x", "y", 2L, 500000L, lift(2, 3, 3)),
      ("y", "z", 1L, 250000L, lift(1, 3, 1))), got.mkString(","))
  }
}
