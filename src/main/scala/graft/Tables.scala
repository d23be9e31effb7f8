package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Central testdata-table loader. All queries read driver-generated
  * Parquet (TESTDATA.md); Parquet gives Catalyst column pruning +
  * predicate pushdown for free, which is the 100 TB-scale posture:
  * a scan should only read the columns/row-groups the plan needs.
  *
  * This is also the ONE schema boundary: loaded frames are checked
  * against the expected column types (checkSchema) so an upstream
  * regeneration that drifts a physical type fails HERE with the
  * table.column named, not five layers deeper as a cryptic
  * DATATYPE_MISMATCH inside some operator's arithmetic (the round-9
  * failure mode: events.ts flipped TIMESTAMP(NANOS) → timestamp[us]
  * and every event query died in pmod type-check).
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    checkSchema(name, df)
    if (name == "events") normalizeEventTs(df) else df
  }

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts ingress contract: downstream operators (Events,
    * TemporalJoins, EventStream callers) do exact integer arithmetic
    * on epoch-NANOS longs. The driver has shipped the column as both
    * Parquet TIMESTAMP(NANOS) (LongType under
    * spark.sql.legacy.parquet.nanosAsLong) and timestamp[us]
    * (TIMESTAMP_NTZ) across testdata generations, so normalize at
    * this one read boundary instead of type-dispatching inside every
    * operator.
    *
    * The NTZ path converts via timestampdiff against the epoch —
    * pure internal-micros arithmetic, independent of
    * spark.sql.session.timeZone. A cast to TimestampType is NOT
    * tz-safe: it re-interprets the NTZ wall clock in session tz
    * (verified: shifts the value by the UTC offset under a non-UTC
    * session). DuckDB's epoch_us(ts) on the same file returns the
    * identical micros, so the oracle SQL needs no dispatch at all.
    * Sub-microsecond digits only ever existed in the nanos physical
    * form, and the µs-precision contract (Events.sessionize doc)
    * already floors them before any cross-engine compare.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df // TIMESTAMP(NANOS) under nanosAsLong — already epoch-nanos
    case TimestampNTZType =>
      df.withColumn("ts",
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)") * 1000L)
    case TimestampType => // internal value IS epoch-micros; unix_micros reads it tz-free
      df.withColumn("ts", unix_micros(col("ts")) * 1000L)
    case other => throw new IllegalStateException(
      s"events.ts arrived as ${other.simpleString} — expected epoch-nanos bigint, " +
        "timestamp_ntz, or timestamp (testdata drift?)")
  }

  /** Nullability-free structural tag for drift comparison. */
  private def typeTag(dt: DataType): String = dt match {
    case ArrayType(e, _) => s"array<${typeTag(e)}>"
    case t => t.simpleString
  }

  // Temporal columns are the ones the driver's generator has actually
  // drifted; accept every physical form the loaders/normalizers handle.
  private val tsForms = Set("bigint", "timestamp_ntz", "timestamp")
  private val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> tsForms, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> tsForms),
    "events" -> Seq("event_id" -> Set("bigint"), "ts" -> tsForms,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")))

  /** Driver-side metadata check only — no job is run. Extra columns
    * are tolerated (additive generator changes are benign); a missing
    * column or a drifted type fails loudly with the culprit named. */
  private[graft] def checkSchema(name: String, df: DataFrame): Unit =
    expected.get(name).foreach { cols =>
      val actual = df.schema.map(f => f.name -> typeTag(f.dataType)).toMap
      cols.foreach { case (cname, ok) =>
        actual.get(cname) match {
          case None => throw new IllegalStateException(
            s"testdata drift: $name.$cname is missing (have: ${df.schema.fieldNames.mkString(", ")})")
          case Some(t) if !ok(t) => throw new IllegalStateException(
            s"testdata drift: $name.$cname is $t — expected one of ${ok.mkString("/")}")
          case _ =>
        }
      }
    }
}
