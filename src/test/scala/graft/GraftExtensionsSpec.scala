package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal

import graft.functions.SimHash64
import graft.operators.Dedup

/** SQL-surface registration of graft's native expressions. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("extension class injects simhash64 with arity checking") {
    // constructing the builder table exercises the injectFunction path
    // without needing a fresh SparkSession
    val (_, _, builder) = GraftExtensions.functions.find(_._1 == "simhash64").get
    assert(builder(Seq(Literal("x"))).isInstanceOf[SimHash64])
    intercept[IllegalArgumentException] { builder(Seq(Literal("x"), Literal("y"))) }
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
  }

  test("dhash64 is callable from SQL and matches the Column API") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, "the quick brown fox jumps over it"), (2L, "pack my box with jugs"))
      .toDF("id", "text").createOrReplaceTempView("ext_imgs")
    val viaSql = spark.sql(
      "SELECT id, dhash64(encode(text, 'UTF-8')) AS fp FROM ext_imgs ORDER BY id")
      .collect().map(_.getString(1)).toSeq
    val viaCol = spark.table("ext_imgs")
      .select($"id", graft.functions.DHash64.dhash64(
        org.apache.spark.sql.functions.encode($"text", "UTF-8")).as("fp"))
      .orderBy($"id").collect().map(_.getString(1)).toSeq
    assert(viaSql == viaCol)
  }

  test("registered function is callable from SQL and matches the Column API") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, "the quick brown fox"), (2L, "pack my box with jugs"))
      .toDF("id", "text").createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT id, simhash64(split(text, ' ')) AS fp FROM ext_docs ORDER BY id")
      .collect().map(_.getString(1)).toSeq
    val viaCol = spark.table("ext_docs")
      .select($"id", Dedup.simhash(Dedup.tokens($"text")).as("fp")).orderBy($"id")
      .collect().map(_.getString(1)).toSeq
    assert(viaSql == viaCol)
  }

  test("minhash_signature / winnow_fingerprints / hamming_hex / rolling_fingerprint from SQL") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    GraftExtensions.register(spark)
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "pack my box with five dozen liquor jugs"),
        (3L, "x"))
      .toDF("id", "text").createOrReplaceTempView("ext_docs2")

    val sqlRows = spark.sql(
      """SELECT id,
        |       minhash_signature(text, 3, 16, false) AS sig,
        |       winnow_fingerprints(text, 5, 4) AS wfp,
        |       rolling_fingerprint(text) AS rfp
        |FROM ext_docs2 ORDER BY id""".stripMargin).collect()
    val colRows = spark.table("ext_docs2")
      .select($"id",
        Dedup.minhashSignatureOf($"text", 3, 16, parity = false).as("sig"),
        TextAnalysis.winnowFingerprints($"text", 5, 4).as("wfp"),
        TextAnalysis.fingerprint($"text").as("rfp"))
      .orderBy($"id").collect()
    assert(sqlRows.map(_.toString).toSeq == colRows.map(_.toString).toSeq)

    // winnow_fingerprints matches the DataFrame operator's set form
    val opFps = TextAnalysis.winnow(spark.table("ext_docs2"), "id", "text", 5, 4)
      .orderBy($"id").collect().map(_.getString(1)).toSeq
    val sqlFps = spark.sql(
      "SELECT array_join(winnow_fingerprints(text, 5, 4), ',') FROM ext_docs2 ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    assert(sqlFps == opFps)

    val hd = spark.sql(
      "SELECT hamming_hex('00ff', '0f0f'), hamming_hex('abcd', 'abcd')").collect()(0)
    assert(hd.getInt(0) === 8 && hd.getInt(1) === 0)

    val vd = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)),
        |       vec_sqdist(array(1.0d, 2.0d), array(3.0d, 4.0d)),
        |       vec_dot(array(1.0d), array(1.0d, 2.0d))""".stripMargin).collect()(0)
    assert(vd.getDouble(0) === 11.0 && vd.getDouble(1) === 8.0)
    assert(vd.isNullAt(2)) // length mismatch nulls, like the HOF chain

    // int/float arrays coerce (ImplicitCastInputTypes), like built-ins
    val vc = spark.sql(
      """SELECT vec_dot(array(1, 2), array(3, 4)),
        |       vec_sqdist(array(CAST(1 AS FLOAT)), array(CAST(3 AS FLOAT)))""".stripMargin)
      .collect()(0)
    assert(vc.getDouble(0) === 11.0 && vc.getDouble(1) === 4.0)

    // tuning parameters must be literals, not columns
    intercept[Exception] {
      spark.sql("SELECT minhash_signature(text, CAST(id AS INT), 16, false) FROM ext_docs2")
        .collect()
    }
  }
}
