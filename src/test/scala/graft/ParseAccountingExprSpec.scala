package graft

import org.apache.spark.sql.functions._
import graft.functions.Exprs
import graft.plans.AccountingParse

/** Native `parse_accounting` Catalyst expression: registered via
  * SparkSessionExtensions, equal to the built-in composition, codegen'd. */
class ParseAccountingExprSpec extends SparkSpec {

  private val corpus = Seq(
    "1,234", "(12)", "12-", "$5.50", " 7 ", "junk", "", "  ", "-3.5",
    "(1,234.50)", "$1,000-", "1.2.3", "--5", "(-)", ".5", "5.", "abc12def",
    "12 34", "(12)-", null)

  test("AccountingParse.parseOrNull matches the composed-regexp model on corpus") {
    import spark.implicits._
    val df = corpus.toDF("v")
    val viaExprs = df.select(Exprs.parseAccountingComposed(col("v"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    val viaNative = df.selectExpr("parse_accounting(v)").collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(viaNative.toSeq == viaExprs.toSeq)
    val viaHelper = corpus.map(s => AccountingParse.parseOrNull(s))
      .map(d => if (d == null) null else d.doubleValue())
    assert(viaHelper == viaExprs.toSeq)
  }

  test("native expression stays inside whole-stage codegen") {
    // spark.range is a real physical source (a local relation would be
    // collapsed before codegen), so this exercises doGenCode end-to-end.
    val df = spark.range(1, 100)
      .selectExpr("parse_accounting(concat('(', id, ')')) AS p")
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen stage; the Project containing
    // parse_accounting must be inside one.
    assert(plan.contains("*(1) Project [parse_accounting"))
    val got = df.collect().map(_.getDouble(0))
    assert(got.toSeq == (1L until 100L).map(i => -i.toDouble))
  }

  test("non-string argument is coerced (registration-time cast)") {
    import spark.implicits._
    val df = Seq(12, -3).toDF("n").selectExpr("parse_accounting(n) AS p")
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(12.0, -3.0))
  }
}
