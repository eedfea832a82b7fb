package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Jsonl, Tables}

/** JSONL source/sink: roundtrip fidelity, explicit-schema reads, and
  * corrupt-line quarantine (the curation pipeline's bad-row routing). */
class JsonlSuite extends SparkSpec {

  test("jsonl roundtrip preserves a mixed-type frame (directory of parts)") {
    val docs = Tables.df(spark, "/root/testdata/sf0.001", "documents")
    val out = "/tmp/graft_jsonl_suite"
    Jsonl.writeJsonl(docs, out)
    val back = Jsonl.readJsonl(spark, out, Some(docs.schema))
    assert(back.count() == docs.count())
    // exact content identity via order-insensitive integer checksum
    def sig(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(crc32(concat_ws("",
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text").cast("binary")))))).head.getLong(0)
    assert(sig(back) == sig(docs))
  }

  test("explicit schema skips inference and pins types") {
    val out = "/tmp/graft_jsonl_types"
    val dir = Paths.get(out)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    Files.createDirectories(dir)
    // ints that inference would widen to long, doubles, nullable fields
    Files.writeString(dir.resolve("part-0.jsonl"),
      """{"id": 1, "score": 0.5, "tag": "a"}
        |{"id": 2, "score": 1.5}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("score", DoubleType),
      StructField("tag", StringType)))
    val got = Jsonl.readJsonl(spark, out, Some(schema))
    assert(got.schema == schema)
    val rows = got.orderBy("id").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(rows(1).isNullAt(2), "missing field must read as null")
  }

  test("PERMISSIVE quarantines corrupt lines; DROPMALFORMED drops them") {
    val out = "/tmp/graft_jsonl_corrupt"
    val dir = Paths.get(out)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("part-0.jsonl"),
      """{"id": 1, "text": "ok"}
        |{"id": oops not json
        |{"id": 3, "text": "also ok"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val got = Jsonl.readJsonl(spark, out, Some(schema)).cache()
    assert(got.count() == 3)
    val bad = got.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad(0).getString(2).contains("oops"))
    assert(got.filter(col("_corrupt_record").isNull)
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    got.unpersist()
    val dropped = Jsonl.readJsonl(spark, out,
      Some(StructType(schema.dropRight(1))), mode = "DROPMALFORMED")
    assert(dropped.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }
}
