package graft

import org.apache.spark.sql.functions._
import graft.functions.Exprs
import graft.core.Na

/** Per-function specs for the scalar expression library (SURVEY.md §2.3),
  * each case mirroring the reference semantics cited in Exprs' Scaladoc. */
class ExprsSpec extends SparkSpec {

  test("F1 naNormalize: NA vocabulary -> null, else trimmed") {
    assert(evalStr("  nan ", Na.naNormalize) == null)
    assert(evalStr("N/A", Na.naNormalize) == null)
    assert(evalStr("NONE", Na.naNormalize) == null)
    assert(evalStr("nah", Na.naNormalize) == null)
    assert(evalStr("", Na.naNormalize) == null)
    assert(evalStr("  x  ", Na.naNormalize) == "x")
    assert(evalStr(null, Na.naNormalize) == null)
  }

  test("F2 parseAccounting: commas, parens, trailing minus, $, junk") {
    assert(evalStr("1,234", Exprs.parseAccounting) == 1234.0)
    assert(evalStr("(12)", Exprs.parseAccounting) == -12.0)
    assert(evalStr("12-", Exprs.parseAccounting) == -12.0)
    assert(evalStr("$5.50", Exprs.parseAccounting) == 5.5)
    assert(evalStr(" 7 ", Exprs.parseAccounting) == 7.0)
    assert(evalStr("junk", Exprs.parseAccounting) == null)
    assert(evalStr("", Exprs.parseAccounting) == null)
  }

  test("F3 leadingNum: number at start (optional $), else 0") {
    assert(evalStr("$12.5 per box", Exprs.leadingNum) == 12.5)
    assert(evalStr("42 cases", Exprs.leadingNum) == 42.0)
    assert(evalStr("about 42", Exprs.leadingNum) == 0.0)
    assert(evalStr("-3 adj", Exprs.leadingNum) == -3.0)
  }

  test("F4 numAnywhere: first number anywhere, else 0.0") {
    assert(evalStr("about 42 cases", Exprs.numAnywhere) == 42.0)
    assert(evalStr("none", Exprs.numAnywhere) == 0.0)
    assert(evalStr("x-12.5y", Exprs.numAnywhere) == -12.5)
  }

  test("F5 firstIntInText / firstIntOrZero") {
    assert(evalStr("po 57466 rest", Exprs.firstIntInText) == 57466L)
    assert(evalStr("nothing", Exprs.firstIntInText) == null)
    assert(evalStr("nothing", Exprs.firstIntOrZero) == 0L)
  }

  test("F6 stripTrailingDotZero: 14.0->14, 14.50 kept") {
    assert(evalStr("14.0", Exprs.stripTrailingDotZero) == "14")
    assert(evalStr("14.00", Exprs.stripTrailingDotZero) == "14")
    assert(evalStr("14.50", Exprs.stripTrailingDotZero) == "14.50")
    assert(evalStr("14", Exprs.stripTrailingDotZero) == "14")
  }

  test("F8 itemCode7: digits-only, strip .0, zfill 7") {
    assert(evalStr("1234567.0", Exprs.itemCode7) == "1234567")
    assert(evalStr("123", Exprs.itemCode7) == "0000123")
    assert(evalStr("ab-45", Exprs.itemCode7) == "0000045")
    assert(evalStr("no digits", Exprs.itemCode7) == null)
  }

  test("F9 fmtCost2: 2-dp money render") {
    assert(evalStr("9.1", Exprs.fmtCost2) == "9.10")
    assert(evalStr("1234.5", Exprs.fmtCost2) == "1,234.50")
  }

  test("F10 lotLast4: last 4 digits of LAST numeric chunk") {
    assert(evalStr("498-68594 39024", Exprs.lotLast4) == 9024L)
    assert(evalStr("12", Exprs.lotLast4) == 12L)
    assert(evalStr("no digits", Exprs.lotLast4) == null)
  }

  test("F11 scrubHiddenChars: ZWSP/BOM removed, NBSP->space, trim") {
    assert(evalStr("​ab﻿", Exprs.scrubHiddenChars) == "ab")
    assert(evalStr("a b", Exprs.scrubHiddenChars) == "a b")
  }

  test("F12 eddPlus2RollWeekend: Sat/Sun roll forward to Monday") {
    import spark.implicits._
    // 2026-08-06 is a Thursday: +2 = Saturday -> Monday 2026-08-10.
    val out = Seq("2026-08-06", "2026-08-07", "2026-08-10").toDF("d")
      .select(date_format(Exprs.eddPlus2RollWeekend(to_date(col("d"))), "yyyy-MM-dd"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("2026-08-10", "2026-08-10", "2026-08-12"))
  }

  test("F13 nextMWF: next Mon/Wed/Fri strictly after base") {
    import spark.implicits._
    // Mon 2026-08-10 -> Wed 12; Wed -> Fri 14; Fri 14 -> Mon 17; Sat 15 -> Mon 17.
    val out = Seq("2026-08-10", "2026-08-12", "2026-08-14", "2026-08-15").toDF("d")
      .select(date_format(Exprs.nextMWF(to_date(col("d"))), "yyyy-MM-dd"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("2026-08-12", "2026-08-14", "2026-08-17", "2026-08-17"))
  }

  test("F14 reformatDateMdy: M/d/yyyy -> MM/dd/yy, passthrough on junk") {
    assert(evalStr("3/5/2026", Exprs.reformatDateMdy) == "03/05/26")
    assert(evalStr("not a date", Exprs.reformatDateMdy) == "not a date")
  }

  test("F17 numLikeToCleanStr: 39.0->39, 1,234.0->1234, 39.50->39.5") {
    assert(evalStr("39.0", Exprs.numLikeToCleanStr) == "39")
    assert(evalStr("1,234.0", Exprs.numLikeToCleanStr) == "1234")
    assert(evalStr("39.50", Exprs.numLikeToCleanStr) == "39.5")
    assert(evalStr(" text ", Exprs.numLikeToCleanStr) == "text")
  }

  test("F19 extractEmails: find-all, lowercase, dedupe") {
    val out = evalStr("A@B.com x a@b.com; c@d.org", Exprs.extractEmails)
    assert(out.asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a@b.com", "c@d.org"))
  }

  test("F20 splitFirstDash: ASCII/en/em dash, first only") {
    val out = evalStr("498–68594-39024", Exprs.splitFirstDash)
    assert(out.asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("498", "68594-39024"))
  }

  test("O1 numericSortKey: numeric strings by value, junk null") {
    assert(evalStr("142", Exprs.numericSortKey) == 142.0)
    assert(evalStr("14.5", Exprs.numericSortKey) == 14.5)
    assert(evalStr("FL-DOCK", Exprs.numericSortKey) == null)
  }
}
