package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the manual lever for the case
  * AQE's runtime skew-join split cannot cover: a join key whose
  * heavy-hitter values concentrate in ONE task on both sides (e.g.
  * joining clickstream rows to a per-key feature table where one key
  * is 30% of traffic, and the right side is too big to broadcast).
  *
  * saltedJoin fans each right-side key row out to `salts` copies and
  * scatters left rows uniformly across them, so a heavy key's rows
  * spread over `salts` tasks instead of one. Cost: the right side is
  * replicated ×salts — use it for moderate right-side cardinality, and
  * prefer broadcast when the right side fits, AQE skew-join when skew
  * is detectable at runtime.
  */
object Skew {

  /** Equi-join `left ⋈ right` on keyCol with `salts`-way salting.
    * saltSrc must be a left-side column with per-row entropy (its own
    * primary key works) — the salt is pmod(xxhash64(saltSrc), salts),
    * deterministic per row, uniform across rows of a hot key.
    * Result equals the plain join (spec-pinned). */
  def saltedJoin(left: DataFrame, right: DataFrame, keyCol: String,
                 salts: Int, saltSrc: Column): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltSrc), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** Hot-key report — the diagnostic that DECIDES whether saltedJoin
    * (or a broadcast, or an AQE hint) is needed: the topK heaviest
    * keys with their corpus share and the salt factor that would
    * spread each to ≈ `targetRows` rows per salted task-key
    * (integer ceil, exact). The number an engineer reads before
    * picking `salts`.
    *
    * Scale shape: one key-grain hash agg (map-side combined), a
    * 1-row total broadcast, TakeOrderedAndProject for the head —
    * never a global sort. Output: (key, cnt, share, salt). */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 20,
                 targetRows: Long = 100000L): DataFrame = {
    require(topK >= 1 && topK <= 10000, s"topK must be in [1, 10000], got $topK")
    require(targetRows >= 1, s"targetRows must be positive, got $targetRows")
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("long").as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("cnt"),
        (col("cnt").cast("double") / col("__total").cast("double")).as("share"),
        // `div`, not `/`: Spark's / on longs is DOUBLE division
        call_function("div", col("cnt") + lit(targetRows - 1), lit(targetRows))
          .as("salt"))
      .orderBy(col("cnt").desc, col("key")).limit(topK)
  }
}
