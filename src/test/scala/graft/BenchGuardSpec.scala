package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the flagged-run divert decision (r19, reworked r20): a
  * contention-flagged or pathology-suspect bench run must NOT overwrite a
  * clean UNFLAGGED official for its sf — neither the one sitting in
  * bench.json (same fingerprint, or an uncertifiable current fingerprint,
  * which fails SAFE) nor one archived in bench_history.jsonl when
  * bench.json was legitimately overwritten by a run at a DIFFERENT sf
  * (the sf0.001-interlude shape: the guard now restores the archived
  * official instead of relying on a manual restore discipline).
  * Pure-function spec, no Spark. */
class BenchGuardSpec extends AnyFunSuite {

  private val fp = "64:abc123"
  private val sf = "/root/testdata/sf0.1"
  private val sfSmall = "/root/testdata/sf0.001"

  private def artifact(flagged: Boolean = false, suspects: String = "[]",
                       sfDir: String = sf, srcFp: String = fp,
                       withContention: Boolean = true,
                       value: Double = 193.3): String = {
    val cont =
      if (withContention)
        s""","contention":{"n_probes":70,"median_ratio":1.25,"flagged":$flagged}"""
      else ""
    s"""{"metric":"total","value":$value,"unit":"sec","queries":{},""" +
      s""""git_head":"deadbeef","src_fingerprint":"$srcFp",""" +
      s""""suspect":$suspects$cont,"sf":"$sfDir"}"""
  }

  private def decide(flaggedRun: Boolean, existing: Option[String],
                     history: Seq[String] = Seq.empty,
                     sfDir: String = sf, srcFp: String = fp) =
    Bench.flaggedOutcome(flaggedRun, existing, history, sfDir, srcFp)

  test("flagged run diverts when a clean official exists for same fp+sf") {
    assert(decide(flaggedRun = true, Some(artifact())) == Bench.Divert(None))
  }

  test("an unflagged run always writes bench.json (never diverts)") {
    assert(decide(flaggedRun = false, Some(artifact())) == Bench.Overwrite)
    assert(decide(flaggedRun = false, None,
      history = Seq(artifact())) == Bench.Overwrite)
  }

  test("no existing artifact and no history -> overwrite (first run wins)") {
    assert(decide(flaggedRun = true, None) == Bench.Overwrite)
  }

  test("an existing FLAGGED artifact never protects") {
    assert(decide(flaggedRun = true,
      Some(artifact(flagged = true))) == Bench.Overwrite)
  }

  test("an existing artifact with pathology suspects never protects") {
    assert(decide(flaggedRun = true,
      Some(artifact(suspects = """["q20_minhash"]"""))) == Bench.Overwrite)
  }

  test("fingerprint mismatch (both known) -> overwrite: positively " +
      "different code, the flagged run is its first measurement") {
    assert(decide(flaggedRun = true,
      Some(artifact(srcFp = "64:other"))) == Bench.Overwrite)
  }

  test("r20 fail-safe: an UNKNOWN current fingerprint cannot certify " +
      "'different code' — a clean same-sf official is still protected " +
      "(the old guard silently disarmed on fingerprint IO errors)") {
    assert(decide(flaggedRun = true, Some(artifact()), srcFp = "unknown")
      == Bench.Divert(None))
  }

  test("unknown current fingerprint with no protectable artifact -> " +
      "overwrite (restore needs a fingerprint to match archived lines on)") {
    assert(decide(flaggedRun = true, None, srcFp = "unknown")
      == Bench.Overwrite)
    assert(decide(flaggedRun = true, Some(artifact(flagged = true)),
      history = Seq(artifact()), srcFp = "unknown") == Bench.Overwrite)
  }

  test("an existing artifact whose OWN fingerprint is unknown/missing " +
      "never protects (it cannot certify 'same code' either)") {
    assert(decide(flaggedRun = true,
      Some(artifact(srcFp = "unknown"))) == Bench.Overwrite)
  }

  test("r19 verdict item 4: sf0.001 clean interlude overwrote bench.json, " +
      "then the sf0.1 official run is flagged -> divert still fires and " +
      "RESTORES the newest archived sf0.1 clean official") {
    val archived = artifact(value = 190.0)
    val newest = artifact(value = 193.3)
    val out = decide(flaggedRun = true,
      existing = Some(artifact(sfDir = sfSmall)),
      history = Seq(archived, newest))
    assert(out == Bench.Divert(Some(newest))) // newest match, not first
  }

  test("history restore skips flagged/suspect/foreign-sf/foreign-fp lines") {
    val history = Seq(
      artifact(flagged = true),                      // flagged: skip
      artifact(suspects = """["q20_minhash"]"""),    // suspect: skip
      artifact(sfDir = sfSmall),                     // wrong sf: skip
      artifact(srcFp = "64:other"),                  // wrong fp: skip
      "{not json")                                   // corrupt: skip
    assert(decide(flaggedRun = true,
      existing = Some(artifact(sfDir = sfSmall)),
      history = history) == Bench.Overwrite)
  }

  test("a corrupt artifact must not pin a stale official -> overwrite " +
      "(no history) / restore from history (match archived)") {
    assert(decide(flaggedRun = true, Some("{not json")) == Bench.Overwrite)
    assert(decide(flaggedRun = true, Some("")) == Bench.Overwrite)
    val official = artifact()
    assert(decide(flaggedRun = true, Some("{not json"),
      history = Seq(official)) == Bench.Divert(Some(official)))
  }

  test("a pre-r19 artifact without contention/fingerprint fields never " +
      "protects (missing fingerprint reads as empty, uncertifiable)") {
    val legacy = """{"metric":"total","value":197.8,"unit":"sec",""" +
      s""""queries":{},"suspect":[],"sf":"$sf"}"""
    assert(decide(flaggedRun = true, Some(legacy)) == Bench.Overwrite)
  }
}
