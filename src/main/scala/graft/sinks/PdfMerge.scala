package graft.sinks

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** K6 — PDF merge sink (SURVEY.md §2.9): all `*.pdf` in a folder, sorted by
  * filename, merged to `"{n} orders {MM-DD-YY}.pdf"`; the last numeric
  * chunk of each stem is surfaced for logging.
  * Ref: /root/reference/247/tools/combine_pdf_tool.py:7-64.
  *
  * The byte-level page merge is behind [[Merger]]: the default
  * [[ConcatMerger]] concatenates documents byte-wise (sufficient for the
  * synthetic fixtures; a production deployment drops a PDFBox-backed
  * implementation into the same interface). Naming, ordering, counting and
  * id-extraction — the reference's observable semantics — are real. */
object PdfMerge {

  trait Merger {
    def merge(inputs: Seq[Path], out: Path): Unit
  }

  /** Byte concatenation placeholder for a real page-level merger. */
  object ConcatMerger extends Merger {
    override def merge(inputs: Seq[Path], out: Path): Unit = {
      val bytes = inputs.toArray.flatMap(p => Files.readAllBytes(p))
      Files.write(out, bytes)
    }
  }

  /** Sorted `*.pdf` files in the folder (O8 stable order). */
  def pdfsIn(dir: String): Seq[Path] =
    if (!Files.isDirectory(Paths.get(dir))) Seq.empty
    else Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.toLowerCase.endsWith(".pdf"))
      .toSeq.sortBy(_.getFileName.toString)

  /** Last numeric chunk of a file stem ("acme-142-57466" -> "57466"). */
  def lastNumericId(fileName: String): Option[String] = {
    val stem = fileName.replaceAll("(?i)\\.pdf$", "")
    "\\d+".r.findAllIn(stem).toSeq.lastOption
  }

  /** Merge all PDFs in `dir` into `destDir/"{n} orders {dateStr}.pdf"`.
    * Returns (output path, the per-file ids logged by the reference). */
  def combine(dir: String, destDir: String, dateStr: String,
              merger: Merger = ConcatMerger): (Path, Seq[String]) = {
    val files = pdfsIn(dir)
    require(files.nonEmpty, s"no PDFs to merge in $dir")
    val out = Paths.get(destDir, s"${files.size} orders $dateStr.pdf")
    Files.createDirectories(out.getParent)
    merger.merge(files, out)
    (out, files.flatMap(f => lastNumericId(f.getFileName.toString)))
  }
}
