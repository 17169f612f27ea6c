package graft

import org.apache.spark.sql.types._

/** Testdata-layout guard (the round-10 lesson): the driver regenerates
  * /root/testdata between rounds, and a silent layout drift (events.ts
  * flipped parquet TIMESTAMP(NANOS) → TIMESTAMP(MICROS)) surfaced as 18
  * runtime failures instead of one failing assertion. This spec re-probes
  * every table the queries read, so the NEXT drift fails here first with
  * a message naming the table and column.
  */
class TablesSpec extends SparkSpec {

  test("all 10 tables load and are non-empty at sf0.001") {
    Tables.names.foreach { t =>
      val n =
        if (t == "events") Tables.events(spark, sf0001).count()
        else Tables.load(spark, sf0001, t).count()
      assert(n > 0, s"table $t is empty")
    }
  }

  test("events.ts surfaces as TimestampType regardless of parquet layout") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType === TimestampType,
      s"events.ts loader must normalize to TimestampType, got ${ev.schema("ts").dataType}")
    // values are sane epoch timestamps (not 1970-adjacent nanos misreads)
    val minYear = ev.selectExpr("min(year(ts))").head().getInt(0)
    assert(minYear >= 1990 && minYear <= 2100,
      s"events.ts min year $minYear — dtype branch likely misinterpreting raw values")
  }

  test("key columns the queries depend on exist with expected types") {
    val expect: Map[String, Map[String, DataType]] = Map(
      "lineitem" -> Map("l_orderkey" -> LongType, "l_quantity" -> DoubleType,
        "l_returnflag" -> StringType),
      "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType),
      "embeddings" -> Map("vec_id" -> LongType),
      "events" -> Map("event_id" -> LongType, "user_id" -> LongType))
    expect.foreach { case (t, cols) =>
      val schema =
        if (t == "events") Tables.events(spark, sf0001).schema
        else Tables.load(spark, sf0001, t).schema
      cols.foreach { case (c, dt) =>
        assert(schema.fieldNames.contains(c), s"$t missing column $c")
        assert(schema(c).dataType === dt,
          s"$t.$c drifted: expected $dt, observed ${schema(c).dataType}")
      }
    }
  }
}
