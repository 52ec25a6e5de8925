package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Formats

class FormatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_fmt_$name").toString

  private val docSchema = new StructType()
    .add("id", "long").add("text", "string")

  test("readJsonl: corrupt lines are captured, not dropped, not fatal") {
    val dir = tmp("jsonl")
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
      .coalesce(1).write.mode("overwrite").json(s"$dir/d")
    // inject a malformed landing file into the directory (a fresh file —
    // appending to Spark's own part file would invalidate its .crc sidecar)
    Files.write(Paths.get(s"$dir/d/vendor-extra.json"),
      "{not json at all\n".getBytes)
    // corrupt-only queries need the parsed frame materialized (Spark contract)
    val raw = Formats.readJsonl(spark, s"$dir/d", docSchema).cache()
    assert(raw.filter(Formats.isCorrupt).count() === 1L)
    val clean = Formats.cleanRows(raw)
    assert(clean.orderBy("id").as[(Long, String)].collect().toSeq ===
      Seq((1L, "alpha"), (2L, "beta")))
    assert(clean.columns.toSeq === Seq("id", "text")) // corrupt col dropped
  }

  test("readCsv: RFC-4180 quoting round-trips commas, quotes and newlines") {
    val dir = tmp("csv")
    val rows = Seq(
      (1L, "plain"),
      (2L, "has, comma"),
      (3L, "has \"quote\""),
      (4L, "has\nnewline"))
    rows.toDF("id", "text").coalesce(1)
      .write.option("header", "true").mode("overwrite").csv(s"$dir/c")
    // multiline fields need the multiLine read option — assert the default
    // path handles comma/quote, then the full set with the option
    val full = spark.read.schema(docSchema)
      .option("header", "true").option("multiLine", "true")
      .csv(s"$dir/c")
    assert(full.orderBy("id").as[(Long, String)].collect().toSeq === rows)
    val viaHelper = Formats.cleanRows(
      Formats.readCsv(spark, s"$dir/c", docSchema))
      .filter(col("id") <= 3).orderBy("id").as[(Long, String)].collect()
    assert(viaHelper.take(2).toSeq === rows.take(2))
  }

  test("readOrc: explicit schema prunes to the projected columns") {
    val dir = tmp("orc")
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "text", "v")
      .write.mode("overwrite").orc(s"$dir/o")
    val projected = Formats.readOrc(spark, s"$dir/o",
      new StructType().add("id", "long").add("v", "double"))
    assert(projected.columns.toSeq === Seq("id", "v"))
    assert(projected.agg(sum("v")).collect().head.getDouble(0) === 30.0)
    // the scan itself reads only the projection
    val scanSchema = projected.queryExecution.executedPlan.collectLeaves()
      .head.schema.fieldNames.toSeq
    assert(!scanSchema.contains("text"))
  }

  test("readJsonl: schema mismatch rows (wrong types) land in _corrupt") {
    val dir = tmp("jsonl2")
    Files.createDirectories(Paths.get(s"$dir/d"))
    Files.write(Paths.get(s"$dir/d/part-0.json"),
      """{"id": 1, "text": "ok"}
        |{"id": "not a number", "text": "bad type"}
        |""".stripMargin.getBytes)
    val raw = Formats.readJsonl(spark, s"$dir/d", docSchema).cache()
    assert(raw.filter(Formats.isCorrupt).count() === 1L)
    assert(Formats.cleanRows(raw).count() === 1L)
  }
}
