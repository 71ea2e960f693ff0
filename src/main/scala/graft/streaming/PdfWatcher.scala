package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** S8 — the file-watch retrieval stage (SURVEY.md §2.1 S8, §2.10) as a
  * Spark state machine.
  *
  * The reference polls N directories for `-<PO>.pdf` files, requires the
  * file size to be UNCHANGED for `settle_time` seconds (re-arming on every
  * change), moves settled files, and gives up per-vendor after
  * `max_wait_seconds` (ref /root/reference/247/tools/read_file_tool.py:199-525,
  * /root/reference/sheet_bot/utils.py:77-406).
  *
  * Spark-first shape: directory scans produce [[FileObs]] observation
  * events; `groupByKey(po).flatMapGroupsWithState` owns the settle/timeout
  * state per PO. The same function serves the Structured Streaming path
  * (file-metadata source -> `watchStream`) and the reference-style driver
  * poll loop (`pollOnce`), so the debounce semantics are tested once,
  * deterministically, with explicit timestamps. */
object PdfWatcher {

  /** One observation of a candidate file during a poll sweep. */
  final case class FileObs(po: String, path: String, size: Long, obsTimeMs: Long)

  /** Per-PO watcher state. */
  final case class PoState(path: String, lastSize: Long, stableSinceMs: Long,
                           firstSeenMs: Long, done: Boolean)

  /** Emitted transition. status ∈ {SETTLED, TIMEOUT}. */
  final case class PoStatus(po: String, status: String, path: String, atMs: Long)

  /** `-<PO>.pdf` matcher, case-insensitive, PO regex-quoted.
    * Ref: /root/reference/247/tools/read_file_tool.py:275-280. */
  def matchPo(fileName: String, pos: Seq[String]): Option[String] =
    pos.find { po =>
      fileName.toLowerCase.endsWith(s"-${po.toLowerCase}.pdf")
    }

  /** The settle/timeout state transition, shared by both execution modes.
    *
    * A PO settles when an observation repeats the same size and
    * `settleMs` has elapsed since that size was first seen (any size change
    * re-arms the clock — the reference's `settle_time` debounce). A PO
    * times out when observations continue past `maxWaitMs` from first
    * sight without settling. */
  def transition(settleMs: Long, maxWaitMs: Long)(
      po: String, obs: Iterator[FileObs],
      state: GroupState[PoState]): Iterator[PoStatus] = {
    var st = state.getOption.orNull
    val out = scala.collection.mutable.ArrayBuffer.empty[PoStatus]
    obs.toSeq.sortBy(_.obsTimeMs).foreach { o =>
      if (st == null) {
        st = PoState(o.path, o.size, o.obsTimeMs, o.obsTimeMs, done = false)
      } else if (!st.done) {
        st =
          if (o.size != st.lastSize || o.path != st.path)
            st.copy(path = o.path, lastSize = o.size, stableSinceMs = o.obsTimeMs)
          else st
        if (o.obsTimeMs - st.stableSinceMs >= settleMs) {
          out += PoStatus(po, "SETTLED", st.path, o.obsTimeMs)
          st = st.copy(done = true)
        } else if (o.obsTimeMs - st.firstSeenMs >= maxWaitMs) {
          out += PoStatus(po, "TIMEOUT", st.path, o.obsTimeMs)
          st = st.copy(done = true)
        }
      }
    }
    if (st != null) state.update(st)
    out.iterator
  }

  /** Batch/driver-loop mode over an accumulated observation log. */
  def settleBatch(obs: Dataset[FileObs], settleMs: Long, maxWaitMs: Long)(
      implicit spark: SparkSession): Dataset[PoStatus] = {
    import spark.implicits._
    obs.groupByKey(_.po)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        transition(settleMs, maxWaitMs))
  }

  /** Streaming mode: same transition over a streaming Dataset of
    * observations (e.g. a directory-listing source). Timeouts are decided
    * from the observation timestamps inside the transition itself, so no
    * engine-level GroupStateTimeout is needed (ProcessingTimeTimeout would
    * also keep an AvailableNow query alive indefinitely re-evaluating
    * timeouts). */
  def settleStream(obs: Dataset[FileObs], settleMs: Long, maxWaitMs: Long)(
      implicit spark: SparkSession): Dataset[PoStatus] = {
    import spark.implicits._
    obs.groupByKey(_.po)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        transition(settleMs, maxWaitMs))
  }

  /** One poll sweep of the watch dirs -> observations for the wanted POs.
    * Driver-side listing, matching the reference's `os.listdir` loop. */
  def sweep(watchDirs: Seq[String], pos: Seq[String], nowMs: Long): Seq[FileObs] =
    watchDirs.flatMap { d =>
      val dir = Paths.get(d)
      if (!Files.isDirectory(dir)) Seq.empty
      else Files.list(dir).iterator().asScala.toSeq.flatMap { p =>
        matchPo(p.getFileName.toString, pos).map { po =>
          FileObs(po, p.toString, Files.size(p), nowMs)
        }
      }
    }

  /** S8 end-to-end, the reference's `retrieve_pdf` surface: poll the watch
    * dirs every `pollMs` until every PO has settled (files then moved to
    * `destDir`) or `maxWaitMs` elapses. `clock`/`sleep` injectable so tests
    * drive virtual time. Returns the terminal status per PO (missing POs
    * get a TIMEOUT row). */
  def watchLoop(watchDirs: Seq[String], pos: Seq[String], destDir: String,
                settleMs: Long, maxWaitMs: Long, pollMs: Long,
                clock: () => Long = () => System.currentTimeMillis(),
                sleep: Long => Unit = Thread.sleep)(
                implicit spark: SparkSession): Seq[PoStatus] = {
    val start = clock()
    val log = scala.collection.mutable.ArrayBuffer.empty[FileObs]
    var done = Map.empty[String, PoStatus]
    while (done.size < pos.size && clock() - start < maxWaitMs) {
      log ++= sweep(watchDirs, pos.filterNot(done.contains), clock())
      if (log.nonEmpty) {
        import spark.implicits._
        val settled = settleBatch(log.toSeq.toDS(), settleMs, maxWaitMs).collect()
        settled.filter(s => !done.contains(s.po)).foreach { s =>
          if (s.status == "SETTLED") moveSettled(s, destDir)
          done += s.po -> s
        }
      }
      if (done.size < pos.size) sleep(pollMs)
    }
    val end = clock()
    pos.map(po => done.getOrElse(po, PoStatus(po, "TIMEOUT", "", end)))
  }

  /** K10 — stability-checked move; skips when already present.
    * Ref: /root/reference/247/tools/read_file_tool.py:389-412. */
  def moveSettled(status: PoStatus, destDir: String): Path = {
    val src = Paths.get(status.path)
    val dest = Paths.get(destDir, src.getFileName.toString)
    Files.createDirectories(dest.getParent)
    if (Files.exists(dest)) dest
    else Files.move(src, dest, StandardCopyOption.ATOMIC_MOVE)
  }

  /** T5 — arrived-item derivation: store code from `...-<store>-<PO>.pdf`,
    * falling back to the PO. Ref: /root/reference/sheet_bot/main.py:52-73. */
  def arrivedItem(fileName: String, po: String): String = {
    val re = s"(?i)-(\\d+)-${java.util.regex.Pattern.quote(po)}\\.pdf$$".r
    re.findFirstMatchIn(fileName).map(_.group(1)).getOrElse(po)
  }
}
