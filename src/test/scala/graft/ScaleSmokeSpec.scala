package graft

/** Executes every ScaleSmoke section at scale=200 (tiny n, same plans).
  *
  * ScaleSmoke is main-code: it compiles on every build but — before this
  * spec — nothing EXECUTED it, so an op output-column rename broke it only
  * at the next manual smoke run (round 17's `col("z6")` incident survived a
  * green suite). Running each section here turns that class of break into a
  * suite failure. The section list is [[ScaleSmoke.AllSections]] itself, so
  * a new section cannot ship without runtime coverage; the inherited
  * codegen-strict session also fails any smoke plan whose generated code
  * regresses. Timings the smoke prints are meaningless at this scale —
  * execution (and the smoke's own internal asserts) is the contract. */
class ScaleSmokeSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  private lazy val tmpBase: String =
    java.nio.file.Files.createTempDirectory("smoke_spec").toString

  for (section <- ScaleSmoke.AllSections.toSeq.sorted)
    test(s"ScaleSmoke section '$section' executes at scale=200") {
      ScaleSmoke.run(spark, Set(section), scale = 200, tmpBase = tmpBase)
    }

  // Mid-scale pass (r19, verdict item 5): the sections that carry
  // internal ERROR-BAND asserts re-run at scale=20 — 10× the data of the
  // scale=200 pass — because at scale=200 the asserts' absolute floors
  // dominate (the KMV intersect band is max(14%, 64) and the true
  // intersect at scale=200 is only 2500, so the suite never exercised the
  // percentage band; at scale=20 the band is 3500 of 25000 — a real
  // accuracy gate). dedup's salt-guard count equality and silhouette's
  // cluster-count contract get the same 10× for free. Sections without
  // internal asserts stay at 200 only — their suite role is
  // rename/codegen coverage, which scale does not change.
  private lazy val tmpMid: String =
    java.nio.file.Files.createTempDirectory("smoke_mid").toString
  for (section <- Seq("dedup", "sketches", "silhouette"))
    test(s"ScaleSmoke section '$section' error bands hold at scale=20") {
      ScaleSmoke.run(spark, Set(section), scale = 20, tmpBase = tmpMid)
    }

  override protected def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(tmpBase))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(tmpMid))
    super.afterAll()
  }
}
