package graft

import java.nio.file.{Files, Paths}
import graft.sinks.PdfMerge

/** K6 PDF merge semantics: stable order, output naming, id extraction. */
class PdfMergeSpec extends SparkSpec {

  test("combine: sorted inputs, '{n} orders {date}.pdf' name, ids logged") {
    val dir = Files.createTempDirectory("pdfs").toString
    Files.write(Paths.get(s"$dir/b-142-57466.pdf"), "B".getBytes)
    Files.write(Paths.get(s"$dir/a-498-68594.pdf"), "A".getBytes)
    Files.write(Paths.get(s"$dir/notes.txt"), "x".getBytes)
    val (out, ids) = PdfMerge.combine(dir, dir, "08-12-26")
    assert(out.getFileName.toString == "2 orders 08-12-26.pdf")
    // sorted by filename: a-498... before b-142...
    assert(new String(Files.readAllBytes(out)) == "AB")
    assert(ids == Seq("68594", "57466"))
  }

  test("lastNumericId") {
    assert(PdfMerge.lastNumericId("acme-142-57466.pdf") == Some("57466"))
    assert(PdfMerge.lastNumericId("no-digits.pdf") == None)
  }
}
