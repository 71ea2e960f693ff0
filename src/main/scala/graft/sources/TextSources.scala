package graft.sources

import java.nio.charset.{Charset, CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
import graft.core.{Na, SchemaOps}
import graft.functions.Exprs

/** S3 — latest-PO-CSV source: newest `.csv` by mtime, decoded through the
  * reference's encoding fallback chain, one PO per line.
  * Ref: /root/reference/247/tools/read_file_tool.py:123-196. */
object LatestCsv {

  /** Most-recent .csv in `dir` by modification time (O6 top-1). */
  def latestCsvIn(dir: String): Path = {
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.toLowerCase.endsWith(".csv")).toSeq
    require(files.nonEmpty, s"no .csv files in $dir")
    files.maxBy(p => Files.getLastModifiedTime(p).toMillis)
  }

  /** Decode with the fallback chain utf-8-sig -> utf-16 -> latin1 ->
    * utf-8(ignore). Strict decoders reject mismatches; latin1 never fails
    * (every byte maps), matching the reference's ordering semantics. */
  def decodeWithFallback(bytes: Array[Byte]): String = {
    def strict(cs: Charset): Option[String] =
      try {
        val dec = cs.newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
        Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
      } catch { case _: CharacterCodingException => None }
    val utf8 = strict(StandardCharsets.UTF_8)
      .map(s => if (s.startsWith("﻿")) s.substring(1) else s)
    // utf-16 requires a BOM to be meaningful (python 'utf-16' behavior)
    val utf16 =
      if (bytes.length >= 2 &&
          ((bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte) ||
           (bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)))
        strict(StandardCharsets.UTF_16)
      else None
    utf8.orElse(utf16).getOrElse(new String(bytes, StandardCharsets.ISO_8859_1))
  }

  /** PO lines -> (PO #, Store, Item): NA-like and dashless lines dropped,
    * split on the FIRST dash (ASCII/en/em). Row order preserved via
    * `_row_idx`. */
  def poDf(spark: SparkSession, lines: Seq[String]): DataFrame = {
    val grid = SchemaOps.gridFromRows(spark, lines.map(Seq(_)))
    grid.select(col(SchemaOps.RowIdx), trim(col("c0")).as("po"))
      .where(!Na.isNa(col("po")) && col("po").rlike("[-\\u2013\\u2014]"))
      .select(
        col(SchemaOps.RowIdx),
        col("po").as("PO #"),
        element_at(Exprs.splitFirstDash(col("po")), 1).as("Store"),
        element_at(Exprs.splitFirstDash(col("po")), 2).as("Item"))
  }

  /** Read the latest CSV in `dir` into the PO DataFrame. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val path = latestCsvIn(dir)
    val text = decodeWithFallback(Files.readAllBytes(path))
    poDf(spark, text.split("\r?\n").toSeq)
  }
}

/** S4 — carrier JSON source: `{store: code}` object chosen by which of
  * {salmon, northern, southern} appears in the data filename (exactly one).
  * Parsed with Spark's own from_json into a map, then exploded to a tidy
  * (Store, carrier code) dimension — broadcastable for J2.
  * Ref: /root/reference/Flips/tools/read_file_tool.py:129-172. */
object CarrierJson {

  val Carriers: Seq[String] = Seq("salmon", "northern", "southern")

  /** Exactly one carrier token must appear in the (cleaned) file stem. */
  def carrierFor(fileStem: String): String = {
    val hits = Carriers.filter(fileStem.toLowerCase.contains)
    hits match {
      case Seq(one) => one
      case Seq() => throw new IllegalArgumentException(
        s"no carrier token in '$fileStem' (need one of ${Carriers.mkString("/")})")
      case many => throw new IllegalArgumentException(
        s"ambiguous carrier tokens ${many.mkString(",")} in '$fileStem'")
    }
  }

  /** Parse one single-object JSON file into (Store, carrier code). */
  def read(spark: SparkSession, jsonPath: String): DataFrame = {
    import spark.implicits._
    val raw = new String(Files.readAllBytes(Paths.get(jsonPath)),
      StandardCharsets.UTF_8)
    Seq(raw).toDF("j")
      .select(explode(from_json(col("j"), MapType(StringType, IntegerType)))
        .as(Seq("Store", "carrier code")))
  }

  /** S4 end-to-end: pick `<carrier>_carrier.json` in `jsonDir` based on the
    * data file stem. */
  def readFor(spark: SparkSession, jsonDir: String, fileStem: String): DataFrame =
    read(spark, s"$jsonDir/${carrierFor(fileStem)}_carrier.json")
}
