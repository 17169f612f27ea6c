package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.sources.Formats

/** Round-trip fidelity of the source/sink surface: write → read must
  * reproduce the dataset exactly (schema-on-read, no inference).
  */
class FormatsSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy(df.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      .collect().map(_.toString).toSeq

  test("parquet round-trip is lossless on lineitem") {
    val dir = Files.createTempDirectory("graft_fmt_pq").toString
    val src = Tables.lineitem(spark, sf0001)
    Formats.writeParquet(src, s"$dir/t")
    val back = Formats.readParquet(spark, s"$dir/t")
    assert(back.schema === src.schema)
    assert(canon(back) === canon(src))
  }

  test("csv round-trip with explicit schema is lossless on orders (incl. timestamps)") {
    val dir = Files.createTempDirectory("graft_fmt_csv").toString
    val src = Tables.orders(spark, sf0001)
    Formats.writeCsv(src, s"$dir/t")
    val back = Formats.readCsv(spark, s"$dir/t", src.schema)
    assert(back.schema === src.schema)
    assert(canon(back) === canon(src))
  }

  test("jsonl round-trip with explicit schema is lossless on documents") {
    val dir = Files.createTempDirectory("graft_fmt_json").toString
    val src = Tables.documents(spark, sf0001)
    Formats.writeJsonLines(src, s"$dir/t")
    val back = Formats.readJsonLines(spark, s"$dir/t", src.schema)
    assert(back.schema === src.schema)
    assert(canon(back) === canon(src))
  }

  test("orc round-trip is lossless on lineitem") {
    val dir = Files.createTempDirectory("graft_fmt_orc").toString
    val src = Tables.lineitem(spark, sf0001)
    Formats.writeOrc(src, s"$dir/t")
    val back = Formats.readOrc(spark, s"$dir/t")
    assert(back.schema === src.schema)
    assert(canon(back) === canon(src))
  }

  test("partitioned layout: a partition-column filter prunes at the scan") {
    val dir = Files.createTempDirectory("graft_fmt_part").toString
    val src = Tables.documents(spark, sf0001)
    Formats.writePartitioned(src, s"$dir/t", Seq("lang"))
    val back = Formats.readParquet(spark, s"$dir/t")
    // content survives the layout change (partition col moves to the end)
    assert(canon(back.select(src.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*))
      === canon(src))
    // the lang predicate must prune DIRECTORIES, not filter rows post-scan:
    // formatted explain shows it under PartitionFilters
    val qe = back.filter(org.apache.spark.sql.functions.col("lang") === "en")
      .queryExecution
    val plan = qe.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val idx = plan.indexOf("PartitionFilters: [")
    assert(idx >= 0, plan.take(2000))
    val pf = plan.substring(idx, plan.indexOf("]", idx))
    assert(pf.contains("lang"), pf)
  }

  test("a graded query runs identically over a csv-backed copy of its table") {
    // source format must be orthogonal to operator semantics
    val dir = Files.createTempDirectory("graft_fmt_q").toString
    val docs = Tables.documents(spark, sf0001)
    Formats.writeCsv(docs, s"$dir/documents")
    val csvDocs = Formats.readCsv(spark, s"$dir/documents", docs.schema)
    val fromParquet = graft.ops.SimilarityJoin
      .jaccardSelf(docs, "doc_id", "text", Seq("lang", "source"), 0.8)
      .collect().map(_.toString).toSeq
    val fromCsv = graft.ops.SimilarityJoin
      .jaccardSelf(csvDocs, "doc_id", "text", Seq("lang", "source"), 0.8)
      .collect().map(_.toString).toSeq
    assert(fromCsv === fromParquet)
  }

  test("xml round-trip is lossless, including markup chars in text (r8)") {
    import spark.implicits._
    // adversarial content: entities, angle brackets, quotes, multi-space
    // runs — exactly what an XML writer must escape and a reader must
    // restore byte-for-byte
    val rows = Seq(
      (1L, "a & b < c > d \"quoted\" 'apos'"),
      (2L, "spaces   preserved   between words"),
      (3L, "plain text"),
      (4L, "&amp; literal entity text &#38;"))
      .toDF("id", "text")
    val tmp = graft.Scratch.perJvm("graft_xmlspec")
    graft.sources.Formats.writeXml(rows, s"$tmp/x")
    val back = graft.sources.Formats.readXml(spark, s"$tmp/x", rows.schema)
    assert(back.count() === 4L)
    val orig = rows.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rt = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rt === orig)
  }
}
