package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Exprs
import graft.ops.Ops

/** SURVEY.md §2 relational operator inventory re-expressed as declared
  * queries over the TESTDATA tables, each with an independent DuckDB oracle.
  *
  * Conventions for exact hash-parity with the oracle:
  *  - money/measure aggregates go through DECIMAL (exact, order-independent),
  *    never raw double sums (double addition is not associative — a parallel
  *    aggregation would hash-differ from DuckDB's);
  *  - every result carries a total ORDER BY;
  *  - timestamps leave the engine as epoch-second BIGINTs or formatted
  *    strings, never raw timestamp columns (µs/ns + tz representation would
  *    differ between engines);
  *  - all computed columns aliased identically on both sides.
  */
object RelationalQueries {

  private val D = "decimal(18,2)"

  /** events.ts as nanosecond-epoch longs, fixture-representation-invariant
    * (see [[Tables.tsNs]]): ns-INT64 fixtures read raw via `nanosAsLong`,
    * µs-timestamp fixtures convert exactly under the UTC session. */
  def eventsNs(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.tsNs(Tables.events(s, d))
  }

  /** Exact money/measure math stays DECIMAL internally, but no DECIMAL ever
    * leaves a declared query: the driver's hasher canonicalizes decimal
    * columns differently per engine (DuckDB decimals become floats on the
    * pandas path, Spark parquet decimals stay exact), so identical values
    * hash-differ. A decimal→string cast is scale-preserving and exact on
    * both engines ("253942.00" both sides), with no double round-trip — so
    * it stays correct at any data scale. Oracle side mirrors with
    * CAST(... AS VARCHAR). */
  def moneyStr(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("string")

  val all: Seq[QueryDef] = Seq(

    // ── A1/A2/A4: hash group-sum (partial+final agg, null keys kept) ──
    QueryDef("q01_group_sum",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          moneyStr(sum($"l_quantity".cast(D)).cast(D)).as("sum_qty"),
          moneyStr(sum($"l_extendedprice".cast(D)).cast(D)).as("sum_price"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // ── A1 + post-agg zero/threshold drop (alloc pipeline shape) ──
    QueryDef("q02_group_sum_dropzero",
      """SELECT l_suppkey,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_qty
        |FROM lineitem
        |WHERE l_returnflag = 'R'
        |GROUP BY l_suppkey
        |HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) <> 0
        |ORDER BY l_suppkey""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where($"l_returnflag" === "R")
        .groupBy($"l_suppkey")
        .agg(sum($"l_quantity".cast(D)).as("sum_qty0"))
        .where($"sum_qty0" =!= 0)
        .select($"l_suppkey", moneyStr($"sum_qty0".cast(D)).as("sum_qty"))
        .orderBy($"l_suppkey")
    },

    // ── U1–U5: unpivot wide→long (single Expand node, no shuffle) ──
    QueryDef("q03_unpivot",
      """SELECT o_orderkey, 'custkey' AS metric,
        |       CAST(CAST(o_custkey AS DECIMAL(18,2)) AS VARCHAR) AS value FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'totalprice' AS metric,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS value FROM orders
        |ORDER BY o_orderkey, metric""".stripMargin) { (s, d) =>
      val wide = Tables.orders(s, d).select(
        $"o_orderkey",
        $"o_custkey".cast(D).as("custkey"),
        $"o_totalprice".cast(D).as("totalprice"))
      Ops.meltToLong(wide, Seq("o_orderkey"), Seq("custkey", "totalprice"),
          "metric", "value")
        .withColumn("value", moneyStr($"value"))
        .orderBy($"o_orderkey", $"metric")
    },

    // ── J1/J2: multi-way equi-join, small dims broadcast ──
    QueryDef("q04_join_enrich",
      """SELECT n.n_name AS nation,
        |  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) AS VARCHAR) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(
          moneyStr(sum($"l_extendedprice".cast(D) * (lit(1) - $"l_discount".cast(D)))
            .cast("decimal(28,4)")).as("revenue"),
          count(lit(1)).as("n_rows"))
        .select($"n_name".as("nation"), $"revenue", $"n_rows")
        .orderBy($"nation")
    },

    // ── q181: ROLLUP revenue report — the OLAP subtotal surface
    //    (region → nation → grand total in ONE aggregate; Catalyst plans
    //    the grouping sets via Expand with partial aggregation, so the
    //    subtotals cost one pass, not three). lvl = grouping bits;
    //    NULLS LAST pinned explicitly on both engines (the standing
    //    Spark-asc-nulls-first / DuckDB-nulls-last divergence). ──
    QueryDef("q181_rollup_revenue",
      """SELECT r.r_name AS region, n.n_name AS nation,
        |  CAST(grouping(r.r_name) AS BIGINT) * 2 +
        |    CAST(grouping(n.n_name) AS BIGINT) AS lvl,
        |  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
        |    AS DECIMAL(28,4)) AS VARCHAR) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP (r.r_name, n.n_name)
        |ORDER BY lvl, region NULLS LAST, nation NULLS LAST""".stripMargin) {
      (s, d) =>
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(
          (grouping($"r_name").cast("long") * 2 +
            grouping($"n_name").cast("long")).as("lvl"),
          moneyStr(sum($"l_extendedprice".cast(D) *
              (lit(1) - $"l_discount".cast(D)))
            .cast("decimal(28,4)")).as("revenue"),
          count(lit(1)).as("n_rows"))
        .select($"r_name".as("region"), $"n_name".as("nation"),
          $"lvl", $"revenue", $"n_rows")
        .orderBy($"lvl", $"region".asc_nulls_last, $"nation".asc_nulls_last)
    },

    // ── q193: share-of-region revenue — the percent-of-total window
    //    report: nation revenue as exact ten-thousandths BIGINT, region
    //    total via a window sum (no second aggregate pass), share as
    //    floor of one IEEE ratio in ppm. ──
    QueryDef("q193_revenue_share",
      """WITH nr AS (
        |  SELECT r.r_name AS region, n.n_name AS nation,
        |    CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
        |      AS DECIMAL(28,4)) * 10000 AS BIGINT) AS rev_e4
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2),
        |w AS (SELECT region, nation, rev_e4,
        |        CAST(sum(rev_e4) OVER (PARTITION BY region) AS BIGINT)
        |          AS region_e4
        |      FROM nr)
        |SELECT region, nation, rev_e4, region_e4,
        |  CAST(floor(CAST(rev_e4 AS DOUBLE) * CAST(1000000 AS DOUBLE)
        |    / CAST(region_e4 AS DOUBLE)) AS BIGINT) AS share_ppm
        |FROM w ORDER BY region, nation""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      val nr = l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name".as("region"), $"n_name".as("nation"))
        .agg((sum($"l_extendedprice".cast(D) *
            (lit(1) - $"l_discount".cast(D)))
          .cast("decimal(28,4)") * lit(10000)).cast("long").as("rev_e4"))
      nr.withColumn("region_e4",
          sum($"rev_e4").over(Window.partitionBy($"region")))
        .withColumn("share_ppm",
          floor($"rev_e4".cast("double") * lit(1000000.0) /
            $"region_e4".cast("double")).cast("long"))
        .orderBy("region", "nation")
    },

    // ── O1: numeric-aware sort (numeric strings by value, junk last) ──
    QueryDef("q05_numeric_sort",
      """WITH keyed AS (
        |  SELECT p_partkey,
        |         CASE WHEN p_partkey % 7 = 0 THEN p_type
        |              ELSE CAST(p_partkey % 150 AS VARCHAR) END AS branch
        |  FROM part)
        |SELECT p_partkey, branch,
        |  ROW_NUMBER() OVER (ORDER BY TRY_CAST(branch AS DOUBLE) NULLS LAST,
        |                     branch, p_partkey) AS rn
        |FROM keyed
        |ORDER BY rn""".stripMargin) { (s, d) =>
      val keyed = Tables.part(s, d).select(
        $"p_partkey",
        when($"p_partkey" % 7 === 0, $"p_type")
          .otherwise(($"p_partkey" % 150).cast("string")).as("branch"))
      val ord = Seq(
        Exprs.numericSortKey($"branch").asc_nulls_last,
        $"branch".asc, $"p_partkey".asc)
      // Output is already globally ordered by rn (see globalRowNumber).
      Ops.globalRowNumber(keyed, ord, "rn")
    },

    // ── A5: first-per-group under explicit total order ──
    QueryDef("q06_first_per_group",
      """SELECT o_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS first_date
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |        ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_orderdate, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      Ops.firstPerGroup(Tables.orders(s, d), Seq("o_custkey"),
          Seq($"o_orderdate".asc, $"o_orderkey".asc))
        .select($"o_custkey", $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("first_date"))
        .orderBy($"o_custkey")
    },

    // ── A7: order-preserving distinct (first occurrence by order col) ──
    QueryDef("q07_distinct_keepfirst",
      """SELECT user_id, event_id, event_type
        |FROM (SELECT user_id, event_id, event_type,
        |        ROW_NUMBER() OVER (PARTITION BY user_id
        |                           ORDER BY event_id) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      Ops.distinctKeepFirst(eventsNs(s, d), Seq("user_id"), "event_id")
        .select($"user_id", $"event_id", $"event_type")
        .orderBy($"user_id")
    },

    // ── F2: accounting-number parse, oracle is an independent CASE ──
    QueryDef("q08_accounting_parse",
      """SELECT p_partkey,
        |  CASE p_partkey % 5
        |    WHEN 0 THEN '(' || CAST(p_partkey AS VARCHAR) || ')'
        |    WHEN 1 THEN CAST(p_partkey AS VARCHAR) || '-'
        |    WHEN 2 THEN '$' || CAST(p_partkey AS VARCHAR) || '.50'
        |    WHEN 3 THEN ' ' || CAST(p_partkey AS VARCHAR) || ' '
        |    ELSE 'n/a' END AS raw,
        |  CASE p_partkey % 5
        |    WHEN 0 THEN -CAST(p_partkey AS DOUBLE)
        |    WHEN 1 THEN -CAST(p_partkey AS DOUBLE)
        |    WHEN 2 THEN CAST(p_partkey AS DOUBLE) + 0.5
        |    WHEN 3 THEN CAST(p_partkey AS DOUBLE)
        |    ELSE NULL END AS parsed
        |FROM part
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      val raw =
        when($"p_partkey" % 5 === 0, concat(lit("("), $"p_partkey".cast("string"), lit(")")))
          .when($"p_partkey" % 5 === 1, concat($"p_partkey".cast("string"), lit("-")))
          .when($"p_partkey" % 5 === 2, concat(lit("$"), $"p_partkey".cast("string"), lit(".50")))
          .when($"p_partkey" % 5 === 3, concat(lit(" "), $"p_partkey".cast("string"), lit(" ")))
          .otherwise(lit("n/a"))
      Tables.part(s, d)
        .select($"p_partkey", raw.as("raw"))
        .withColumn("parsed", Exprs.parseAccounting($"raw"))
        .orderBy($"p_partkey")
    },

    // ── F6/F8: item-code normalization (strip .0, digits, pad to 7) ──
    QueryDef("q09_item_code",
      """SELECT p_partkey,
        |  lpad(CAST(p_partkey AS VARCHAR), 7, '0') AS item_code,
        |  CAST(p_partkey AS VARCHAR) AS clean_num
        |FROM part
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
          $"p_partkey",
          Exprs.itemCode7(concat($"p_partkey".cast("string"), lit(".0"))).as("item_code"),
          Exprs.numLikeToCleanStr(concat($"p_partkey".cast("string"), lit(".00"))).as("clean_num"))
        .orderBy($"p_partkey")
    },

    // ── F12/F14: business-date math + reformat with passthrough ──
    QueryDef("q10_dates",
      """SELECT o_orderkey,
        |  strftime(CAST(o_orderdate AS DATE), '%-m/%-d/%Y') AS mdy,
        |  strftime(CAST(o_orderdate AS DATE), '%m/%d/%y') AS mdy_short,
        |  strftime(CASE dayofweek(CAST(o_orderdate AS DATE) + 2)
        |             WHEN 6 THEN CAST(o_orderdate AS DATE) + 4
        |             WHEN 0 THEN CAST(o_orderdate AS DATE) + 3
        |             ELSE CAST(o_orderdate AS DATE) + 2 END, '%Y-%m-%d') AS edd
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val dt = to_date($"o_orderdate")
      Tables.orders(s, d).select(
          $"o_orderkey",
          date_format(dt, "M/d/yyyy").as("mdy0"),
          Exprs.eddPlus2RollWeekend(dt).as("edd0"))
        .select(
          $"o_orderkey",
          $"mdy0".as("mdy"),
          Exprs.reformatDateMdy($"mdy0").as("mdy_short"),
          date_format($"edd0", "yyyy-MM-dd").as("edd"))
        .orderBy($"o_orderkey")
    },

    // ── F1: NA vocabulary normalization ──
    QueryDef("q11_na_normalize",
      """SELECT event_id,
        |  CASE event_id % 8
        |    WHEN 0 THEN NULL WHEN 1 THEN NULL WHEN 2 THEN NULL
        |    WHEN 3 THEN NULL WHEN 4 THEN NULL WHEN 5 THEN NULL
        |    WHEN 6 THEN NULL
        |    ELSE event_type END AS clean
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val raw =
        when($"event_id" % 8 === 0, lit("na"))
          .when($"event_id" % 8 === 1, lit("N/A"))
          .when($"event_id" % 8 === 2, lit(" nan"))
          .when($"event_id" % 8 === 3, lit("NONE"))
          .when($"event_id" % 8 === 4, lit("null"))
          .when($"event_id" % 8 === 5, lit("nah"))
          .when($"event_id" % 8 === 6, lit("  "))
          .otherwise($"event_type")
      eventsNs(s, d)
        .select($"event_id", Exprs.naNormalize(raw).as("clean"))
        .orderBy($"event_id")
    },

    // ── window frame: per-customer running total (beyond-reference) ──
    QueryDef("q12_running_window",
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,2)) AS VARCHAR) AS running
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select(
          $"o_custkey", $"o_orderkey",
          moneyStr(sum($"o_totalprice".cast(D)).over(w).cast(D)).as("running"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // ── T1 analog: processing-time bucketed aggregation over events ──
    QueryDef("q13_time_agg",
      """SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
        |  COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour_bucket, event_type""".stripMargin) { (s, d) =>
      eventsNs(s, d)
        .groupBy(Tables.floorDiv("ts", 3600000000000L).as("hour_bucket"), $"event_type")
        .agg(count(lit(1)).as("n"),
          moneyStr(sum($"value".cast(D)).cast(D)).as("sum_value"))
        .orderBy($"hour_bucket", $"event_type")
    },

    // ── exact dedup by content hash (scale path: hash-groupBy, never
    //    shuffles full text bodies as the key) ──
    QueryDef("q14_dedup_exact",
      """SELECT md5(text) AS content_hash,
        |  MIN(doc_id) AS keeper_id, COUNT(*) AS dup_count
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY keeper_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5($"text".cast("binary")).as("content_hash"))
        .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("dup_count"))
        .orderBy($"keeper_id")
    },

    // ── interval join without equi-keys, bucketized (Ops.intervalJoin):
    //    per-type half-open maintenance windows derived from the data,
    //    every event matched to every containing window of ANY type. The
    //    oracle is the naive range join; the engine meets in a long-keyed
    //    hash join on day buckets. ──
    QueryDef("q61_interval_join",
      """WITH ev AS (
        |  SELECT event_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |mins AS (SELECT event_type AS itype, min(ts_us) AS t0
        |         FROM ev GROUP BY 1),
        |ivs AS (
        |  SELECT itype, k,
        |    t0 + k * 604800000000 AS s,
        |    t0 + k * 604800000000 + 302400000000 AS e
        |  FROM mins CROSS JOIN range(3) AS r(k))
        |SELECT event_id, itype, k
        |FROM ev JOIN ivs ON ev.ts_us >= ivs.s AND ev.ts_us < ivs.e
        |ORDER BY event_id, itype, k""".stripMargin) { (s, d) =>
      val W = 604800000000L // 7 days in us; windows cover each week's first half
      val ev = eventsNs(s, d).select($"event_id",
        Tables.floorDiv("ts", 1000L).as("ts_us"), $"event_type")
      val ivs = ev.groupBy($"event_type".as("itype"))
        .agg(min($"ts_us").as("t0"))
        .select($"itype", explode(array((0 to 2).map(k => struct(
            lit(k.toLong).as("k"),
            ($"t0" + k * W).as("s"),
            ($"t0" + k * W + W / 2).as("e"))): _*)).as("_w"))
        .select($"itype", $"_w.k".as("k"), $"_w.s".as("s"), $"_w.e".as("e"))
      Ops.intervalJoin(ev, "ts_us", ivs, "s", "e",
          bucketWidth = 86400000000L) // 1-day buckets
        .select($"event_id", $"itype", $"k")
        .orderBy($"event_id", $"itype", $"k")
    },

    // ── interval OVERLAP join (Ops.intervalOverlapJoin): per-user activity
    //    spans × the same per-type windows, half-open overlap; oracle is
    //    the naive range predicate. ──
    QueryDef("q62_overlap_join",
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |spans AS (
        |  SELECT user_id, min(ts_us) AS us, max(ts_us) + 1 AS ue
        |  FROM ev GROUP BY 1),
        |mins AS (SELECT event_type AS itype, min(ts_us) AS t0
        |         FROM ev GROUP BY 1),
        |ivs AS (
        |  SELECT itype, k,
        |    t0 + k * 604800000000 AS s,
        |    t0 + k * 604800000000 + 302400000000 AS e
        |  FROM mins CROSS JOIN range(3) AS r(k))
        |SELECT user_id, itype, k
        |FROM spans JOIN ivs ON spans.us < ivs.e AND ivs.s < spans.ue
        |ORDER BY user_id, itype, k""".stripMargin) { (s, d) =>
      val W = 604800000000L
      val ev = eventsNs(s, d).select($"user_id",
        Tables.floorDiv("ts", 1000L).as("ts_us"), $"event_type")
      val spans = ev.groupBy($"user_id")
        .agg(min($"ts_us").as("us"), (max($"ts_us") + 1).as("ue"))
      val ivs = ev.groupBy($"event_type".as("itype"))
        .agg(min($"ts_us").as("t0"))
        .select($"itype", explode(array((0 to 2).map(k => struct(
            lit(k.toLong).as("k"),
            ($"t0" + k * W).as("s"),
            ($"t0" + k * W + W / 2).as("e"))): _*)).as("_w"))
        .select($"itype", $"_w.k".as("k"), $"_w.s".as("s"), $"_w.e".as("e"))
      Ops.intervalOverlapJoin(spans, "us", "ue", ivs, "s", "e",
          bucketWidth = 86400000000L)
        .select($"user_id", $"itype", $"k")
        .orderBy($"user_id", $"itype", $"k")
    },

    // ── long-interval self-defense under the oracle: an "audit" interval
    //    covering the ENTIRE event range at 1-hour buckets (hundreds of
    //    buckets — far over directBuckets=256, so it takes the two-stage
    //    √-split path) joined alongside a typical one-bucket interval.
    //    Proves the split path is EXACT, not just fast, on real data. ──
    QueryDef("q66_long_interval",
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events),
        |b AS (SELECT min(ts_us) AS t0, max(ts_us) + 1 AS t1 FROM ev),
        |ivs AS (
        |  SELECT 'audit' AS itype, t0 AS s, t1 AS e FROM b
        |  UNION ALL
        |  SELECT 'early' AS itype, t0 AS s, t0 + 3600000000 AS e FROM b)
        |SELECT event_id, itype
        |FROM ev JOIN ivs ON ev.ts_us >= ivs.s AND ev.ts_us < ivs.e
        |ORDER BY event_id, itype""".stripMargin) { (s, d) =>
      val ev = eventsNs(s, d).select($"event_id",
        Tables.floorDiv("ts", 1000L).as("ts_us"))
      val b = ev.agg(min($"ts_us").as("t0"), (max($"ts_us") + 1).as("t1"))
      val ivs = b.select(lit("audit").as("itype"), $"t0".as("s"), $"t1".as("e"))
        .unionAll(b.select(lit("early").as("itype"), $"t0".as("s"),
          ($"t0" + 3600000000L).as("e")))
      Ops.intervalJoin(ev, "ts_us", ivs, "s", "e",
          bucketWidth = 3600000000L) // 1-hour buckets
        .select($"event_id", $"itype")
        .orderBy($"event_id", $"itype")
    }
  )

  // Convenience for $"…" interpolator without a SparkSession in scope.
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }
}
