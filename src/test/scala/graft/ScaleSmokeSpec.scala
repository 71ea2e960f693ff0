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

  override protected def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(tmpBase))
    super.afterAll()
  }
}
