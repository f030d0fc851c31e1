package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class JsonlSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("gzip JSONL round-trip preserves content exactly, including escapes") {
    val docs = Seq(
      (1L, "plain words"),
      (2L, "quotes \" and \\ backslash and\nnewline and\ttab"),
      (3L, "unicode é中文 and emoji-free high codepoints ☃"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString + "/shards"
    Jsonl.writeJsonlGz(docs.repartition(2), dir)
    // really gzip shards, and shard count follows partitioning
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".json.gz"))
    assert(parts.length == 2, parts.mkString(","))
    val back = Jsonl.readJsonl(spark, dir, schema)
    assert(back.filter(col("_corrupt").isNotNull).count() == 0)
    val got = back.select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == docs.as[(Long, String)].collect().sortBy(_._1).toSeq)
  }

  test("corrupt lines are quarantined in _corrupt, never fatal, clean rows unaffected") {
    val dir = java.nio.file.Files.createTempDirectory("jsonlbad")
    java.nio.file.Files.write(dir.resolve("shard.jsonl"),
      ("""{"doc_id": 1, "text": "good"}""" + "\n" +
       """{"doc_id": 2 "text": "missing comma"""" + "\n" +
       """{"doc_id": 3, "text": "also good"}""" + "\n").getBytes("UTF-8"))
    val df = Jsonl.readJsonl(spark, dir.toString, schema)
    val clean = df.filter(col("_corrupt").isNull).select("doc_id").as[Long].collect().sorted
    assert(clean.toSeq == Seq(1L, 3L))
    val corrupt = df.filter(col("_corrupt").isNotNull).select("_corrupt").as[String].collect()
    assert(corrupt.length == 1 && corrupt.head.contains("missing comma"))
  }

  test("blank and whitespace-only lines are quarantined, not phantom all-null rows") {
    // from_json maps a blank line to a NULL STRUCT whose _corrupt is also
    // null — without the explicit coalesce these passed a `_corrupt IS NULL`
    // filter as phantom rows
    val dir = java.nio.file.Files.createTempDirectory("jsonlblank")
    java.nio.file.Files.write(dir.resolve("shard.jsonl"),
      ("""{"doc_id": 1, "text": "good"}""" + "\n" +
       "\n" +
       "   \t  \n" +
       """{"doc_id": 2, "text": "also good"}""" + "\n").getBytes("UTF-8"))
    val df = Jsonl.readJsonl(spark, dir.toString, schema)
    val clean = df.filter(col("_corrupt").isNull)
    assert(clean.count() == 2, "exactly the two real rows are clean")
    assert(clean.filter(col("doc_id").isNull).count() == 0, "no phantom all-null rows")
    assert(df.filter(col("_corrupt").isNotNull).count() == 2,
      "both blank variants land in quarantine")
  }
}
