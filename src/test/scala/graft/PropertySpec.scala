package graft

import graft.functions.{Exprs, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based checks: ScalaCheck generates adversarial inputs in bulk,
  * one DataFrame pass evaluates the native/codegen'd expression, and the
  * result is compared against a plain-Scala model. Catches the edge classes
  * hand-picked examples miss (empty/whitespace strings, duplicate-heavy
  * arrays, boundary numerics). */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    LazyList.continually(g.sample).flatten.take(n).toList

  test("SortedLongIntersectCount == set-model intersection size") {
    import spark.implicits._
    val g = for {
      a <- Gen.listOf(Gen.chooseNum(-50L, 50L))
      b <- Gen.listOf(Gen.chooseNum(-50L, 50L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    val data = samples(g)
    val got = data.toDF("a", "b")
      .select(graft.plans.SortedLongIntersectCount(col("a"), col("b")))
      .collect().map(_.getLong(0))
    data.zip(got).foreach { case ((a, b), n) =>
      assert(n == a.toSet.intersect(b.toSet).size.toLong, s"a=$a b=$b")
    }
  }

  test("urlNormalize is idempotent and strips all tracking params") {
    import spark.implicits._
    val param = Gen.oneOf("utm_source=x", "utm_campaign=yy", "ref=r1",
      "fbclid=abc", "id=7", "q=hello", "page=2")
    val g = for {
      host <- Gen.oneOf("a.com", "www.b-site.org", "sub.c.io")
      path <- Gen.oneOf("", "/", "/p", "/a/b.html")
      ps <- Gen.listOf(param)
      frag <- Gen.oneOf("", "#top", "#sec-2")
    } yield s"https://$host$path" +
      (if (ps.isEmpty) "" else "?" + ps.mkString("&")) + frag
    val urls = samples(g)
    val once = urls.toDF("u")
      .select(TextFunctions.urlNormalize(col("u"))).collect().map(_.getString(0))
    val twice = once.toSeq.toDF("u")
      .select(TextFunctions.urlNormalize(col("u"))).collect().map(_.getString(0))
    once.zip(twice).foreach { case (a, b) => assert(a == b, s"not idempotent: $a") }
    once.foreach { u =>
      assert(!u.contains("utm_") && !u.contains("ref=") && !u.contains("fbclid") &&
        !u.contains("#"), s"tracking survived: $u")
      assert(!u.endsWith("?") && !u.endsWith("&"), s"dangling separator: $u")
    }
  }

  test("dupLineFrac == 1 - distinct/total lines, always in [0,1]") {
    import spark.implicits._
    val line = Gen.oneOf("a", "b", "aa", "x y", "", " ")
    val g = Gen.nonEmptyListOf(line).map(_.mkString("\n"))
    val texts = samples(g)
    val got = texts.toDF("t")
      .select(TextFunctions.dupLineFrac(col("t"))).collect().map(_.getDouble(0))
    texts.zip(got).foreach { case (t, f) =>
      val lines = t.split("\n", -1).toSeq
      val expect = BigDecimal((lines.size - lines.distinct.size).toDouble / lines.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(f - expect) < 1e-9, s"text=${t.replace("\n", "\\n")}")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("wordBigrams: size == max(tokens-1, 0), pairs adjacent") {
    import spark.implicits._
    val tok = Gen.oneOf("cat", "DOG", "x1", "a")
    val g = Gen.listOf(tok).map(_.mkString(" "))
    val texts = samples(g)
    val got = texts.toDF("t")
      .select(TextFunctions.wordBigrams(col("t"))).collect().map(_.getSeq[String](0))
    texts.zip(got).foreach { case (t, bgs) =>
      val toks = t.trim.toLowerCase.split("\\s+").toSeq.filter(_ => t.trim.nonEmpty)
      assert(bgs.size == math.max(toks.size - 1, 0), s"text='$t'")
      bgs.zipWithIndex.foreach { case (bg, i) =>
        assert(bg == s"${toks(i)} ${toks(i + 1)}", s"text='$t' i=$i")
      }
    }
  }

  test("parse_accounting: model round-trip over formatted decimals") {
    import spark.implicits._
    val g = for {
      neg <- Gen.oneOf(true, false)
      whole <- Gen.chooseNum(0L, 9999999L)
      cents <- Gen.chooseNum(0, 99)
      commas <- Gen.oneOf(true, false)
    } yield {
      val w = if (commas) f"$whole%,d" else whole.toString
      val s = f"$w.$cents%02d"
      (if (neg) s"($s)" else s, (if (neg) -1 else 1) * (whole + cents / 100.0))
    }
    val data = samples(g)
    val got = data.map(_._1).toDF("s")
      .select(Exprs.parseAccounting(col("s"))).collect()
      .map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    data.zip(got).foreach { case ((s, expect), v) =>
      assert(math.abs(v - expect) < 1e-6, s"input='$s' got=$v expect=$expect")
    }
  }

  test("numericSortKey: ordering by key == ordering by numeric value") {
    import spark.implicits._
    val g = Gen.chooseNum(-1000.0, 1000.0).map(d => BigDecimal(d)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString)
    val strs = samples(g).distinct
    val keyed = strs.toDF("s")
      .select(col("s"), Exprs.numericSortKey(col("s")).as("k"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val byKey = keyed.sortBy(_._2).map(_._1).toSeq
    val byVal = strs.sortBy(BigDecimal(_)).toSeq
    assert(byKey == byVal)
  }
}
