package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.DocIO

/** JSONL corpus interchange: byte-lossless round trip for hostile
  * text, NULL field handling, corrupt-line capture, shard count. */
class DocIOSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dociotest_$tag").toString

  test("JSONL round trip is byte-lossless for hostile text and NULLs") {
    import spark.implicits._
    val hostile = Seq(
      (1L, Some("plain ascii"), Some("en")),
      (2L, Some("quotes \" and \\ backslash"), Some("de")),
      (3L, Some("newline\nand\ttab and \r return"), None), // null source
      (4L, Some("unicode é中文 and emoji 😀"), Some("zh")),
      (5L, Some("control  chars"), Some("en")),
      (6L, None, Some("fr")) // null text
    ).toDF("doc_id", "text", "source")
    val path = tmpDir("roundtrip")
    DocIO.writeJsonl(hostile, path, shards = 2)
    val back = DocIO.readJsonl(spark, path, hostile.schema)
    assert(DocIO.ingestAudit(back) === ((6L, 0L)))
    val got = back.filter(col("_corrupt_record").isNull)
      .select("doc_id", "text", "source")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2))))).toMap
    val want = hostile.collect().map(r => r.getLong(0) ->
      ((Option(r.getString(1)), Option(r.getString(2))))).toMap
    assert(got === want, "every byte, quote, control char and NULL must survive")
    // shard count respected
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-")).toSeq
    assert(files.size === 2, s"asked for 2 shards, got ${files.map(_.getName)}")
  }

  test("JSONL round trip survives 300 fuzzed unicode strings (seeded)") {
    import spark.implicits._
    // seeded fuzz over the full valid-scalar-value space: ASCII,
    // controls, BMP (surrogates excluded — an unpaired surrogate is
    // not valid UTF-8 and no real corpus line contains one), and
    // supplementary planes via proper pairs. One batched round trip.
    val rnd = new scala.util.Random(20260814L)
    def fuzzChar(): String = rnd.nextInt(4) match {
      case 0 => (32 + rnd.nextInt(95)).toChar.toString // printable ascii
      case 1 => rnd.nextInt(32).toChar.toString        // control chars
      case 2 =>                                         // BMP, no surrogates
        var c = 0; do c = rnd.nextInt(0xFFFF) while (c >= 0xD800 && c <= 0xDFFF)
        c.toChar.toString
      case 3 => new String(Character.toChars(0x10000 + rnd.nextInt(0x10000)))
    }
    val docs = (1L to 300L).map(i =>
      (i, (0 until rnd.nextInt(40)).map(_ => fuzzChar()).mkString))
    val df = docs.toDF("doc_id", "text")
    val path = tmpDir("fuzz")
    DocIO.writeJsonl(df, path, shards = 3)
    val back = DocIO.readJsonl(spark, path, df.schema)
    assert(DocIO.ingestAudit(back) === ((300L, 0L)), "no line may parse corrupt")
    val got = back.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) === text, s"doc $id must round-trip byte-identically")
    }
  }

  test("CSV round trip: quoting, doubles, and NULL-vs-empty disambiguation") {
    import spark.implicits._
    val flat = Seq(
      (1L, Some("plain"), Some(12.34)),
      (2L, Some("comma, inside"), Some(-0.5)),
      (3L, Some("quote \" and 'apos'"), Some(1.0e-7)),
      (4L, Some(""), Some(9.999999999999e12)), // EMPTY string, not null
      (5L, None, None) // genuine NULLs
    ).toDF("id", "s", "v")
    val path = tmpDir("csv")
    DocIO.writeCsv(flat, path, shards = 2)
    val back = DocIO.readCsv(spark, path, flat.schema)
    assert(DocIO.ingestAudit(back) === ((5L, 0L)))
    val got = back.filter(col("_corrupt_record").isNull)
      .select("id", "s", "v")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    val want = flat.collect().map(r => r.getLong(0) ->
      ((Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(got === want,
      "commas, quotes, doubles, empty string and NULL must all round-trip")
    assert(got(4L)._1 === Some(""), "empty string must NOT collapse to NULL")
    assert(got(5L)._1 === None, "NULL must NOT become a string")
  }

  test("corrupt lines cost one audit row each, never the ingest") {
    import spark.implicits._
    val good = Seq((1L, "ok"), (2L, "also ok")).toDF("doc_id", "text")
    val path = tmpDir("corrupt")
    DocIO.writeJsonl(good, path)
    // poison the directory with a malformed line
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "part-poison.txt"),
      "{\"doc_id\": 3, \"text\": unterminated\n")
    val back = DocIO.readJsonl(spark, path, good.schema)
    val (clean, corrupt) = DocIO.ingestAudit(back)
    assert(clean === 2L && corrupt === 1L)
    val bad = back.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length === 1)
    assert(bad(0).getAs[String]("_corrupt_record").contains("unterminated"),
      "the raw offending line must be preserved for the audit")
    // the corruptCol name must not collide with a data column
    intercept[IllegalArgumentException] {
      DocIO.readJsonl(spark, path,
        good.schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
    }
  }

  test("CSV round trip survives 300 fuzzed unicode strings (seeded)") {
    import spark.implicits._
    // Seeded fuzz over the valid-scalar space MINUS the two write-time
    // rejections (line breaks, the literal \N) — the CSV twin of the
    // JSONL fuzz above: commas, quotes, backslashes, controls, BMP,
    // supplementary planes, leading/trailing whitespace, empty
    // strings, and NULLs must all round-trip through the headered
    // splittable format.
    val rnd = new scala.util.Random(20260814L)
    def fuzzChar(): String = rnd.nextInt(6) match {
      case 0 => (32 + rnd.nextInt(95)).toChar.toString // printable ascii
      case 1 => Seq(",", "\"", "\\", " ", "\t")(rnd.nextInt(5)) // CSV-hostile
      case 2 => // control chars, minus CR/LF (rejected at write)
        var c = 0; do c = rnd.nextInt(32) while (c == 10 || c == 13)
        c.toChar.toString
      case 3 => // BMP, no surrogates
        var c = 0; do c = rnd.nextInt(0xFFFF) while (c >= 0xD800 && c <= 0xDFFF)
        c.toChar.toString
      case _ => new String(Character.toChars(0x10000 + rnd.nextInt(0x10000)))
    }
    def fuzzVal(): Option[String] =
      if (rnd.nextInt(10) == 0) None // NULL field
      else {
        val s = (0 until rnd.nextInt(40)).map(_ => fuzzChar()).mkString
        if (s == "\\N") Some(s + "_") else Some(s)
      }
    val docs = (1L to 300L).map(i => (i, fuzzVal()))
    val df = docs.toDF("doc_id", "text")
    val path = tmpDir("csvfuzz")
    DocIO.writeCsv(df, path, shards = 3)
    val back = DocIO.readCsv(spark, path, df.schema)
    assert(DocIO.ingestAudit(back) === ((300L, 0L)), "no line may parse corrupt")
    val got = back.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) === text, s"row $id must round-trip exactly")
    }
  }

  test("writeCsv fails fast on embedded line breaks and the literal \\N (ADVICE r11)") {
    import spark.implicits._
    def writeFails(rows: Seq[(Long, String)]): Unit = {
      val path = tmpDir("csvguard")
      val e = intercept[Throwable] {
        DocIO.writeCsv(rows.toDF("id", "s"), path)
      }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => String.valueOf(t.getMessage)).mkString(" | ")
      assert(msgs.contains("cannot round-trip"),
        s"want the writeCsv guard message, got: $msgs")
    }
    writeFails(Seq((1L, "ok"), (2L, "broken\nline")))
    writeFails(Seq((1L, "carriage\rreturn")))
    writeFails(Seq((1L, "\\N")))
    // NULLs and newline-free text still write fine
    val path = tmpDir("csvok")
    DocIO.writeCsv(Seq((1L, Some("fine")), (2L, None)).toDF("id", "s"), path)
    val back = DocIO.readCsv(spark,
      path, Seq((1L, Option("x"))).toDF("id", "s").schema)
    assert(DocIO.ingestAudit(back) === ((2L, 0L)))
  }
}
