package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import graft.sources.{CarrierJson, LatestCsv}

/** S3 latest-CSV (encoding fallback chain) and S4 carrier JSON specs. */
class TextSourcesSpec extends SparkSpec {

  test("S3 decode chain: utf-8-sig, utf-16 BOM, latin1 fallback") {
    val sig = "﻿142-57466".getBytes(StandardCharsets.UTF_8)
    assert(LatestCsv.decodeWithFallback(sig) == "142-57466")
    val u16 = "498–68594".getBytes(StandardCharsets.UTF_16) // BOM included
    assert(LatestCsv.decodeWithFallback(u16) == "498–68594")
    // invalid UTF-8 bytes -> latin1 (never fails)
    val latin = Array[Byte]('a'.toByte, 0xE9.toByte, 'b'.toByte)
    assert(LatestCsv.decodeWithFallback(latin) == "aéb")
  }

  test("S3 poDf: NA drop, dashless drop, first-dash split, order kept") {
    val df = LatestCsv.poDf(spark, Seq(
      "142-57466", "498–68594", "nah", "", "457x12345", " 1-2-3 "))
    assert(rows(df.select(df("PO #"), df("Store"), df("Item"))) == Seq(
      Seq("142-57466", "142", "57466"),
      Seq("498–68594", "498", "68594"),
      Seq("1-2-3", "1", "2-3")))
  }

  test("S3 latest-by-mtime file pick") {
    val dir = Files.createTempDirectory("csv-spec").toString
    Files.write(Paths.get(s"$dir/old.csv"), "1-1".getBytes)
    Files.write(Paths.get(s"$dir/new.csv"), "2-2".getBytes)
    Files.setLastModifiedTime(Paths.get(s"$dir/old.csv"),
      java.nio.file.attribute.FileTime.fromMillis(1000))
    Files.setLastModifiedTime(Paths.get(s"$dir/new.csv"),
      java.nio.file.attribute.FileTime.fromMillis(2000))
    assert(LatestCsv.latestCsvIn(dir).getFileName.toString == "new.csv")
    val df = LatestCsv.read(spark, dir)
    assert(rows(df.select(df("Store"), df("Item"))) == Seq(Seq("2", "2")))
  }

  test("S4 carrier choice: exactly one of salmon/northern/southern") {
    assert(CarrierJson.carrierFor("baby flip northern week 3") == "northern")
    intercept[IllegalArgumentException](CarrierJson.carrierFor("baby flip"))
    intercept[IllegalArgumentException](
      CarrierJson.carrierFor("salmon southern"))
  }

  test("S4 json object -> (Store, carrier code) dimension") {
    val dir = Files.createTempDirectory("carrier-spec").toString
    Files.write(Paths.get(s"$dir/northern_carrier.json"),
      """{"114": 8, "123": 8, "142": 3}""".getBytes(StandardCharsets.UTF_8))
    val df = CarrierJson.readFor(spark, dir, "flip northern w3")
    assert(df.columns.toSeq == Seq("Store", "carrier code"))
    assert(rows(df.orderBy("Store")) ==
      Seq(Seq("114", 8), Seq("123", 8), Seq("142", 3)))
  }
}
