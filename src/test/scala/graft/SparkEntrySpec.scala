package graft

/** Driver-contract guards: the declared query surface must stay internally
  * consistent (a duplicate name would silently collapse in the Map the
  * driver consumes). */
class SparkEntrySpec extends SparkSpec {

  test("query names are unique (no silent Map collapse)") {
    val names = SparkEntry.queryDefs.map(_.name)
    val dupes = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle belongs to a declared query; oracles are non-empty SQL") {
    val names = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(names.contains(name), s"oracle for unknown query $name")
      assert(sql.trim.toUpperCase.startsWith("SELECT") ||
        sql.trim.toUpperCase.startsWith("WITH"), s"$name oracle isn't a query")
    }
  }

  test("flagship entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // EVERY declared query must EXECUTE end-to-end — round 2 shipped a query
  // whose unresolved column only surfaced at runtime (it crashed the driver
  // bench) because nothing in the suite ran the query map. count() forces
  // analysis + full execution at the smallest fixture.
  for (name <- SparkEntry.queries.keys.toSeq.sorted)
    test(s"declared query $name executes at sf0.001") {
      val n = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0)
    }
}
