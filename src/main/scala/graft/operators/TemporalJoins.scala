package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no built-in operator for — composed from
  * existing operators per the extension ladder's first rung (SURVEY
  * build rules: compose before custom plans), with shuffle shapes
  * that survive scale.
  *
  * - asofJoin: "latest right row at or before each left row" — the
  *   timeseries/feature-lookup join. ONE shuffle by key via the
  *   union + running-last window trick: no per-row subquery, no range
  *   scan, state per task is one row of right-side values.
  * - rangeJoin: point-in-interval matching without the cross product
  *   a naive non-equi join plans (BroadcastNestedLoop — the classic
  *   scale-killer). Points and intervals are bucketed to a coarse
  *   grid; intervals explode to the buckets they overlap, the join is
  *   an EQUI-join on (key, bucket), and the exact predicate filters
  *   in-bucket. Work is O(points + intervals · avg_buckets + matches).
  */
object TemporalJoins {

  /** Backward inclusive as-of join: for each left row, attach
    * `valueCols` from the right row with the greatest rightTs ≤
    * leftTs for the same key (ties on rightTs broken by the LAST
    * right row in (ts, tieCol) order). Left rows with no prior right
    * row get nulls.
    *
    * Both sides shuffle ONCE by keyCol; a single ascending window
    * pass carries the running last right-side values into the
    * interleaved left rows. Right rows sort before left rows at equal
    * timestamps (inclusive semantics).
    *
    * The right row's values travel as ONE struct, so a matched row is
    * atomic: a NULL inside one value column never tears the output by
    * falling back to an older row's value for just that column (which
    * per-column ignoreNulls carry would do).
    *
    * NULL timestamps (review r15): a right row with NULL rightTs is
    * EXCLUDED — under the ascending window order it sorted nulls-
    * first, i.e. "before all time", and its values attached to every
    * left row lacking a real prior match (the forward variant's
    * descending order hid the same row instead — inconsistent). A
    * left row with NULL leftTs stays in the output with NULL values:
    * "latest right row at or before NULL" has no defined answer. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               valueCols: Seq[String], rightTieCol: String): DataFrame = {
    // a non-numeric tie column would cast to NULL for every row,
    // silently un-determinizing equal-timestamp ordering (resolve
    // case-insensitively, like Spark's default column resolution)
    val tieField = right.schema.find(_.name.equalsIgnoreCase(rightTieCol))
      .getOrElse(throw new IllegalArgumentException(
        s"rightTieCol '$rightTieCol' not found in ${right.columns.mkString(", ")}"))
    require(tieField.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"rightTieCol '$rightTieCol' must be numeric, got ${tieField.dataType}")
    val leftCols = left.columns
    val l = left.select(col(keyCol), col(leftTsCol).as("__ts"),
      lit(1).as("__side"), lit(Long.MaxValue).as("__tie"),
      struct(leftCols.toIndexedSeq.filterNot(_ == keyCol).map(col): _*).as("__lrow"))
    val r = right.select(col(keyCol), col(rightTsCol).as("__ts"),
      lit(0).as("__side"), col(rightTieCol).cast("long").as("__tie"),
      struct(valueCols.map(col): _*).as("__vals"))
      .filter(col("__ts").isNotNull)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol).orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(c =>
        (if (c == keyCol) col(c) else col("__lrow").getField(c)).as(c)) ++
        valueCols.map(c =>
          when(col("__ts").isNotNull, col("__vals").getField(c)).as(c)): _*)
  }

  /** FORWARD inclusive as-of join: for each left row, attach
    * `valueCols` from the right row with the SMALLEST rightTs ≥
    * leftTs for the same key — the label-lookahead join ("the next
    * purchase at or after this impression") that backward as-of
    * cannot express and that a naive theta join plans as a nested
    * loop. Ties on rightTs resolve to the FIRST right row in
    * (ts, tieCol asc) order; left rows with no later right row get
    * nulls.
    *
    * Same one-shuffle union trick as asofJoin, traversed DESCENDING:
    * the running-last carry walks from the future toward the past, so
    * "last right row seen" IS the nearest following one. At equal
    * timestamps right rows order before left rows (inclusive), and
    * within a right-side ts group the tie column descends so the
    * tie-asc winner is carried last.
    *
    * NULL timestamps excluded/nulled exactly as in asofJoin (review
    * r15) — here the descending order put a NULL-ts right row at the
    * END where it matched nothing, and a NULL-ts LEFT row after it
    * picked up the carry of the ENTIRE right timeline (the
    * smallest-ts row) instead of the NULL match it should get. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
                      leftTsCol: String, rightTsCol: String,
                      valueCols: Seq[String], rightTieCol: String): DataFrame = {
    val tieField = right.schema.find(_.name.equalsIgnoreCase(rightTieCol))
      .getOrElse(throw new IllegalArgumentException(
        s"rightTieCol '$rightTieCol' not found in ${right.columns.mkString(", ")}"))
    require(tieField.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"rightTieCol '$rightTieCol' must be numeric, got ${tieField.dataType}")
    val leftCols = left.columns
    val l = left.select(col(keyCol), col(leftTsCol).as("__ts"),
      lit(1).as("__side"), lit(Long.MinValue).as("__tie"),
      struct(leftCols.toIndexedSeq.filterNot(_ == keyCol).map(col): _*).as("__lrow"))
    val r = right.select(col(keyCol), col(rightTsCol).as("__ts"),
      lit(0).as("__side"), col(rightTieCol).cast("long").as("__tie"),
      struct(valueCols.map(col): _*).as("__vals"))
      .filter(col("__ts").isNotNull)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ts").desc, col("__side"), col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(c =>
        (if (c == keyCol) col(c) else col("__lrow").getField(c)).as(c)) ++
        valueCols.map(c =>
          when(col("__ts").isNotNull, col("__vals").getField(c)).as(c)): _*)
  }

  /** Point-in-interval range join on a shared key: returns
    * point-row ⋈ interval-row pairs where lo ≤ pt ≤ hi (all long
    * columns). bucketWidth trades replication for selectivity: each
    * interval is exploded to ceil(span/width)+1 bucket rows; pick a
    * width near the typical interval span. */
  def rangeJoin(points: DataFrame, ptCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                keyCol: String, bucketWidth: Long,
                maxBucketsPerInterval: Int = 100000): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    // exact integer floor division via Events.lfloorDiv: epoch-scale
    // longs exceed 2^53, so a double divide would round
    def bucket(c: Column): Column = Events.lfloorDiv(c, bucketWidth)
    val p = points.withColumn("__b", bucket(col(ptCol)))
    // fail loudly on a pathological interval (sentinel lo, unit-mixed
    // timestamps): one wide row would otherwise explode to millions of
    // bucket rows or overflow the array limit. assert_true returns
    // NULL on success, so the filter passes every valid row.
    // NULL-bounded (open) intervals are dropped, matching the
    // pre-guard explode(sequence(NULL, ...)) behavior; the guard also
    // rejects INVERTED intervals (lo > hi) — Spark's sequence would
    // DESCEND through |span| buckets, the exact explosion being
    // guarded against
    val span = bucket(col(hiCol)) - bucket(col(loCol))
    val iv = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull)
      .filter(coalesce(
        assert_true(span >= 0 && span < maxBucketsPerInterval,
          lit(s"rangeJoin: an interval is inverted (lo > hi) or spans >= " +
            s"$maxBucketsPerInterval buckets at bucketWidth=$bucketWidth — " +
            "wrong unit or sentinel bound?")),
        lit(true)))
      .withColumn("__b",
        explode(sequence(bucket(col(loCol)), bucket(col(hiCol)))))
    p.join(iv, Seq(keyCol, "__b"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__b")
  }

  /** Interval×interval OVERLAP join on a shared key: pairs where
    * [lo1, hi1] ∩ [lo2, hi2] ≠ ∅ (closed bounds, exact longs) — the
    * sessions×campaigns / downtime×deploys shape that a point-in-
    * interval join can't express. Same grid trick as rangeJoin, both
    * sides exploded to their covering buckets and equi-joined on
    * (key, bucket) — plus the EXACTLY-ONCE dedup: an overlapping
    * pair shares every bucket in the overlap, so the match is kept
    * only in the FIRST bucket both intervals cover
    * (max(bucket(lo1), bucket(lo2))) — one row per pair without a
    * distinct over the pair table. NULL/inverted/over-wide intervals
    * hit rangeJoin's same loud guard semantics (dropped / error).
    *
    * Scale shape: equi-join planned (never a nested-loop range
    * theta-join), replication = interval span / bucketWidth per
    * side. Output: left columns + right columns. */
  def intervalOverlapJoin(left: DataFrame, lo1Col: String, hi1Col: String,
                          right: DataFrame, lo2Col: String, hi2Col: String,
                          keyCol: String, bucketWidth: Long,
                          maxBucketsPerInterval: Int = 100000): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    def bucket(c: Column): Column = Events.lfloorDiv(c, bucketWidth)
    def exploded(df: DataFrame, loCol: String, hiCol: String, side: String) = {
      val span = bucket(col(hiCol)) - bucket(col(loCol))
      df.filter(col(loCol).isNotNull && col(hiCol).isNotNull)
        .filter(coalesce(
          assert_true(span >= 0 && span < maxBucketsPerInterval,
            lit(s"intervalOverlapJoin: a $side interval is inverted (lo > hi) or " +
              s"spans >= $maxBucketsPerInterval buckets at bucketWidth=$bucketWidth " +
              "— wrong unit or sentinel bound?")),
          lit(true)))
        .withColumn("__b", explode(sequence(bucket(col(loCol)), bucket(col(hiCol)))))
    }
    exploded(left, lo1Col, hi1Col, "left")
      .join(exploded(right, lo2Col, hi2Col, "right"), Seq(keyCol, "__b"))
      .filter(col(lo1Col) <= col(hi2Col) && col(lo2Col) <= col(hi1Col))
      .filter(col("__b") === greatest(bucket(col(lo1Col)), bucket(col(lo2Col))))
      .drop("__b")
  }
}
