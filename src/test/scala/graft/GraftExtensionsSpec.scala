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
}
