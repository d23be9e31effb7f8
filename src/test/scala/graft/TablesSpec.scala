package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The read-boundary contracts: ts normalization (every physical form
  * the driver has shipped → epoch-nanos long) and the schema-drift
  * tripwire (a regenerated table with a flipped type fails HERE with
  * the column named — round 9's failure mode was this drift surfacing
  * five layers deep as a pmod DATATYPE_MISMATCH). */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("normalizeEventTs: epoch-nanos long input passes through untouched") {
    import spark.implicits._
    val df = Seq((1L, 1704067798778549000L)).toDF("event_id", "ts")
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType == LongType)
    assert(out.select("ts").head.getLong(0) == 1704067798778549000L)
  }

  test("normalizeEventTs: TIMESTAMP_NTZ converts tz-independently to epoch nanos") {
    val df = spark.sql(
      "SELECT TIMESTAMP_NTZ'2024-01-01 00:09:58.778549' AS ts, 1L AS event_id")
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType == LongType)
    // DuckDB: epoch_us(TIMESTAMP '2024-01-01 00:09:58.778549') = 1704067798778549
    assert(out.select("ts").head.getLong(0) == 1704067798778549L * 1000L)
    // and the conversion must not read spark.sql.session.timeZone: the
    // NTZ wall clock IS the UTC epoch value, whatever the session says
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(Tables.normalizeEventTs(df).select("ts").head.getLong(0)
        == 1704067798778549L * 1000L)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("normalizeEventTs: pre-1970 NTZ keeps exact negative micros") {
    val df = spark.sql("SELECT TIMESTAMP_NTZ'1969-12-31 23:59:59.999999' AS ts")
    assert(Tables.normalizeEventTs(df).select("ts").head.getLong(0) == -1000L)
  }

  test("normalizeEventTs: unsupported type names itself in the error") {
    import spark.implicits._
    val df = Seq(("oops", 1L)).toDF("ts", "event_id")
    val e = intercept[IllegalStateException](Tables.normalizeEventTs(df))
    assert(e.getMessage.contains("events.ts arrived as string"))
  }

  test("checkSchema: drifted column type fails naming table.column and both types") {
    import spark.implicits._
    // events.value as string instead of double
    val bad = Seq((1L, 1L, 1L, "click", "not-a-double", "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val e = intercept[IllegalStateException](Tables.checkSchema("events", bad))
    assert(e.getMessage.contains("events.value"))
    assert(e.getMessage.contains("string"))
    assert(e.getMessage.contains("double"))
  }

  test("checkSchema: missing column fails naming it; extra columns are tolerated") {
    import spark.implicits._
    val missing = Seq((1L, "x")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException](Tables.checkSchema("documents", missing))
    assert(e.getMessage.contains("documents.lang"))
    val extra = Seq((1L, "x", "en", "web", 1L, "bonus"))
      .toDF("doc_id", "text", "lang", "source", "n_chars", "extra_col")
    Tables.checkSchema("documents", extra) // must not throw
  }

  test("checkSchema: accepts every shipped ts physical form") {
    import spark.implicits._
    val asLong = Seq((1L, 2L, 3L, "t", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    Tables.checkSchema("events", asLong)
    val asNtz = asLong.withColumn("ts",
      expr("TIMESTAMP_NTZ'2024-01-01 00:00:00'"))
    Tables.checkSchema("events", asNtz)
  }
}
