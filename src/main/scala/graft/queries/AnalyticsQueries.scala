package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** OLAP operators the reference lacks but Catalyst supplies for free
  * (SURVEY.md §2.5 note) — declared so the engine's analytics surface is
  * explicit and oracle-checked: rollup hierarchies, exact heavy hitters,
  * exact discrete quantiles. */
object AnalyticsQueries {

  private val D = "decimal(18,2)"

  val all: Seq[QueryDef] = Seq(

    // ── rollup: region -> nation hierarchy with subtotals ──
    QueryDef("q42_rollup",
      """SELECT r.r_name AS region, n.n_name AS nation,
        |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_bal,
        |  COUNT(*) AS n_cust
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP (r.r_name, n.n_name)
        |ORDER BY region NULLS FIRST, nation NULLS FIRST""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(sum(col("c_acctbal").cast(D)).cast(D).as("total_bal"),
          count(lit(1)).as("n_cust"))
        .orderBy(col("region").asc_nulls_first, col("nation").asc_nulls_first)
    },

    // ── exact heavy hitters: top-5 parts by order volume, rank-dense ──
    QueryDef("q43_heavy_hitters",
      """SELECT l_partkey, n, rk FROM (
        |  SELECT l_partkey, COUNT(*) AS n,
        |         DENSE_RANK() OVER (ORDER BY COUNT(*) DESC) AS rk
        |  FROM lineitem GROUP BY l_partkey)
        |WHERE rk <= 5
        |ORDER BY rk, l_partkey""".stripMargin) { (s, d) =>
      val counts = Tables.lineitem(s, d)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      counts
        .withColumn("rk", dense_rank().over(Window.orderBy(col("n").desc)))
        .where(col("rk") <= 5)
        .select(col("l_partkey"), col("n"), col("rk"))
        .orderBy(col("rk"), col("l_partkey"))
    },

    // ── exact discrete quantiles of order totals per priority ──
    QueryDef("q44_quantiles",
      """SELECT o_orderpriority,
        |  CAST(quantile_disc(CAST(o_totalprice AS DECIMAL(18,2)), 0.5)
        |       AS DECIMAL(18,2)) AS p50,
        |  CAST(quantile_disc(CAST(o_totalprice AS DECIMAL(18,2)), 0.9)
        |       AS DECIMAL(18,2)) AS p90
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      // Exact discrete quantile: the value at ceil(q*n)-th position of the
      // sorted group (duckdb quantile_disc semantics), computed with a
      // rank window + conditional min — deterministic, no interpolation.
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("price").asc)
      val ranked = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_totalprice").cast(D).as("price"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("o_orderpriority"))))
      ranked.groupBy(col("o_orderpriority"))
        .agg(
          min(when(col("rn") >= ceil(col("n") * 0.5), col("price"))).cast(D).as("p50"),
          min(when(col("rn") >= ceil(col("n") * 0.9), col("price"))).cast(D).as("p90"))
        .orderBy(col("o_orderpriority"))
    }
  )
}
