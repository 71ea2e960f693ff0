package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the flagged-run divert decision (r19): a contention-flagged or
  * pathology-suspect bench run must NOT overwrite an existing UNFLAGGED
  * bench.json for the same source fingerprint + sf — the mechanism that
  * stops a late contended run from becoming the round's archived official
  * (the r17 AND r18 failure shape). Pure-function spec, no Spark. */
class BenchGuardSpec extends AnyFunSuite {

  private val fp = "64:abc123"
  private val sf = "/root/testdata/sf0.1"

  private def artifact(flagged: Boolean = false, suspects: String = "[]",
                       sfDir: String = sf, srcFp: String = fp,
                       withContention: Boolean = true): String = {
    val cont =
      if (withContention)
        s""","contention":{"n_probes":70,"median_ratio":1.25,"flagged":$flagged}"""
      else ""
    s"""{"metric":"total","value":193.3,"unit":"sec","queries":{},""" +
      s""""git_head":"deadbeef","src_fingerprint":"$srcFp",""" +
      s""""suspect":$suspects$cont,"sf":"$sfDir"}"""
  }

  test("flagged run diverts when a clean official exists for same fp+sf") {
    assert(Bench.shouldDivert(flaggedRun = true, Some(artifact()), sf, fp))
  }

  test("an unflagged run always writes bench.json (never diverts)") {
    assert(!Bench.shouldDivert(flaggedRun = false, Some(artifact()), sf, fp))
  }

  test("no existing artifact -> overwrite (first run at this code wins)") {
    assert(!Bench.shouldDivert(flaggedRun = true, None, sf, fp))
  }

  test("an existing FLAGGED artifact never protects") {
    assert(!Bench.shouldDivert(flaggedRun = true,
      Some(artifact(flagged = true)), sf, fp))
  }

  test("an existing artifact with pathology suspects never protects") {
    assert(!Bench.shouldDivert(flaggedRun = true,
      Some(artifact(suspects = """["q20_minhash"]""")), sf, fp))
  }

  test("fingerprint or sf mismatch -> overwrite (different code or scale)") {
    assert(!Bench.shouldDivert(flaggedRun = true,
      Some(artifact(srcFp = "64:other")), sf, fp))
    assert(!Bench.shouldDivert(flaggedRun = true,
      Some(artifact(sfDir = "/root/testdata/sf0.01")), sf, fp))
  }

  test("an unknown fingerprint cannot certify 'same code' -> overwrite") {
    assert(!Bench.shouldDivert(flaggedRun = true,
      Some(artifact(srcFp = "unknown")), sf, "unknown"))
  }

  test("a corrupt artifact must not pin a stale official -> overwrite") {
    assert(!Bench.shouldDivert(flaggedRun = true, Some("{not json"), sf, fp))
    assert(!Bench.shouldDivert(flaggedRun = true, Some(""), sf, fp))
  }

  test("a pre-r19 artifact without contention/fingerprint fields never " +
      "protects (missing fingerprint reads as empty, mismatching)") {
    val legacy = """{"metric":"total","value":197.8,"unit":"sec",""" +
      s""""queries":{},"suspect":[],"sf":"$sf"}"""
    assert(!Bench.shouldDivert(flaggedRun = true, Some(legacy), sf, fp))
  }
}
