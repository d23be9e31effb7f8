package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Events

/** Structured Streaming twins of the batch event operators: the same
  * logical aggregations expressed over an unbounded source, with
  * watermarks bounding state. The reference has no streaming at all
  * (SURVEY.md §2.2) — this is part of the 100 TB pipeline extension
  * surface: at scale, event feeds arrive continuously and the engine
  * must fold them incrementally rather than rescanning.
  *
  * All transforms accept any DataFrame with the events schema
  * (event_id, ts epoch-nanos long, user_id, event_type, value, props)
  * whether batch or streaming — the plan is identical; only the sink
  * differs.
  */
object EventStream {

  /** Watermarked tumbling counts per event type. With a streaming
    * source, late rows beyond the watermark are dropped and window
    * state is evicted — bounded memory regardless of stream length. */
  def windowedCounts(events: DataFrame, width: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events.withColumn("ets", Events.tsFromNanos(col("ts")))
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("bucket"), col("event_type"), col("n"))

  /** Watermarked HOPPING counts per event type — windowedCounts with
    * overlap: window() with a slide shorter than the width assigns
    * each event to width/slide windows (the same start set as the
    * batch Events.hoppingByType: starts ≡ 0 mod slide covering the
    * event), and the watermark evicts each window's state once its
    * end passes — state is windows-in-horizon × types, not stream
    * length. */
  def hoppingCounts(events: DataFrame, width: String = "1 hour",
                    step: String = "15 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events.withColumn("ets", Events.tsFromNanos(col("ts")))
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), width, step).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("bucket"), col("event_type"), col("n"))

  /** Watermarked session windows per user (native session_window —
    * gap-based, merging as events arrive). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events.withColumn("ets", Events.tsFromNanos(col("ts")))
      .withWatermark("ets", watermark)
      .groupBy(col("user_id"), session_window(col("ets"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("t_start"),
        unix_timestamp(col("w.end")).as("t_end"), col("n_events"))

  /** Watermarked rolling active users — the streaming WAU/MAU twin of
    * Events.rollingActiveUsers: distinct users per sliding window
    * (length = windowPeriods·width, slide = width), anchored like the
    * batch operator at the window's LAST period. Two chained stateful
    * operators (supported in append mode): dropDuplicates on (user,
    * window) — one state entry per active (user, window) inside the
    * watermark horizon, the exact-distinct analogue of the batch
    * (user, period) dedup, NEVER a distinct aggregate — then a plain
    * windowed count. Append semantics: each anchor emits exactly
    * once, when the watermark passes its window's end. */
  def activeUsers(events: DataFrame, widthSeconds: Long = 86400L,
                  windowPeriods: Int = 7, watermark: String = "1 hour"): DataFrame = {
    require(widthSeconds > 0, s"widthSeconds must be positive, got $widthSeconds")
    require(windowPeriods >= 1 && windowPeriods <= 1000,
      s"windowPeriods must be in [1,1000], got $windowPeriods")
    events.withColumn("ets", Events.tsFromNanos(col("ts")))
      .withWatermark("ets", watermark)
      .select(col("user_id"),
        window(col("ets"), s"${widthSeconds * windowPeriods} seconds",
          s"$widthSeconds seconds").as("w"))
      .dropDuplicates("user_id", "w")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_active"))
      .select((unix_timestamp(col("w.end")) / widthSeconds - 1).cast("long").as("period"),
        col("n_active"))
  }

  /** Stream-stream attribution join: click events matched to the
    * purchases they precede within `windowMicros` — the streaming
    * form of the batch range join (TemporalJoins.rangeJoin via
    * q_range_attrib). Both sides carry watermarks and the join
    * condition bounds the two event times against each other, which
    * is exactly what lets Spark evict buffered rows once the
    * opposite watermark passes their match horizon — state is
    * arrival-rate × horizon, never stream length. Inner join in
    * append mode emits each matched pair exactly once, as soon as
    * both sides have arrived (no watermark wait on output — only
    * eviction waits). Timestamps are µs-floored by the shared
    * ingress contract, so an exact-µs SQL oracle replays the pair
    * set. Output: (p_id, c_id). */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      windowMicros: Long = 300000000L,
                      watermark: String = "10 minutes"): DataFrame = {
    require(windowMicros > 0, s"windowMicros must be positive, got $windowMicros")
    val c = clicks.select(col("event_id").as("c_id"), col("user_id"),
        Events.tsFromNanos(col("ts")).as("c_ets"))
      .withWatermark("c_ets", watermark)
    val p = purchases.select(col("event_id").as("p_id"), col("user_id").as("__pu"),
        Events.tsFromNanos(col("ts")).as("p_ets"))
      .withWatermark("p_ets", watermark)
    c.join(p, col("user_id") === col("__pu") &&
        col("c_ets") >= col("p_ets") - expr(s"INTERVAL $windowMicros MICROSECOND") &&
        col("c_ets") <= col("p_ets"))
      .select(col("p_id"), col("c_id"))
  }

  final case class UserRunning(user_id: Long, n_events: Long, sum_cents: Long)

  /** Custom keyed state: running per-user totals via
    * mapGroupsWithState — the escape hatch for stateful logic that
    * windowed aggregation can't express. State per key is two longs
    * (value folded in exact cents), so memory is O(users). */
  def runningUserTotals(events: DataFrame): Dataset[UserRunning] = {
    implicit val longEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[UserRunning]
    implicit val stateEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    events
      .select(col("user_id").cast("long"), col("value"))
      .groupByKey((r: Row) => r.getLong(0))(longEnc)
      .mapGroupsWithState[(Long, Long), UserRunning](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Row], state: GroupState[(Long, Long)]) =>
          val (n0, c0) = state.getOption.getOrElse((0L, 0L))
          var n = n0; var cents = c0
          rows.foreach { r => n += 1; cents += math.round(r.getDouble(1) * 100) }
          state.update((n, cents))
          UserRunning(user, n, cents)
      }
  }

  final case class UserFunnel(user_id: Long, step: Int)

  /** Streaming funnel state machine: per user the furthest ordered
    * step reached, folded incrementally — the greedy in-order scan
    * ("first occurrence of the next step strictly after the current
    * step's time") computes exactly the batch funnel's min-time chain
    * when events arrive in time order, so the sink's final per-user
    * step aggregates to the SAME counts as Events.funnelCounts (the
    * driver gate replays the batch funnel SQL verbatim as the
    * oracle). State is two scalars per user; in-batch order is the
    * (µs-floored ts, event_id) batch contract, like scdCurrentState.
    */
  def funnelProgress(events: DataFrame, steps: Seq[String]): Dataset[UserFunnel] = {
    require(steps.nonEmpty && steps.size <= 8,
      s"steps must be 1..8, got ${steps.size}")
    implicit val longEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[UserFunnel]
    implicit val stEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("long"), col("event_type"))
      .groupByKey((r: Row) => r.getLong(0))(longEnc)
      .mapGroupsWithState[(Int, Long), UserFunnel](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Row], state: GroupState[(Int, Long)]) =>
          var (cur, lastTs) = state.getOption.getOrElse((0, Long.MinValue))
          rows.toSeq
            .sortBy(r => (Math.floorDiv(r.getLong(2), 1000L), r.getLong(1)))
            .foreach { r =>
              val tsUs = Math.floorDiv(r.getLong(2), 1000L)
              if (cur < steps.length && r.getString(3) == steps(cur)
                  && (cur == 0 || tsUs > lastTs)) {
                cur += 1
                lastTs = tsUs
              }
            }
          state.update((cur, lastTs))
          UserFunnel(user, cur)
      }
  }

  final case class UserScd(user_id: Long, version: Long, event_type: String,
                           valid_from_us: Long, n_events: Long)

  /** Streaming SCD current-state: the incremental twin of
    * Events.scd2Intervals' OPEN row — per user, the current
    * event-type run (version, type, valid_from, run length) folded
    * across micro-batches with mapGroupsWithState. The warehouse
    * pattern: the batch operator backfills the full type-2 history;
    * this keeps the "state as of now" row hot without rescanning.
    *
    * State per key is one small case class (two longs, a string, two
    * more longs) — O(users) memory. In-batch arrival order is made
    * deterministic by sorting each group's rows on the batch contract
    * (µs-floored ts, event_id) — the same total order the batch
    * operator's window uses; cross-batch order is the source's
    * responsibility (event feeds are near-ordered; a watermark-backed
    * variant would buffer stragglers).
    *
    * Update-mode emission: one row per (user, batch-with-activity);
    * the sink's latest row per user (max version, then max n_events —
    * both monotone) IS the current state and equals the batch
    * operator's is_current row exactly (spec + driver-gated). */
  def scdCurrentState(events: DataFrame): Dataset[UserScd] = {
    implicit val longEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[UserScd]
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("long"), col("event_type"))
      .groupByKey((r: Row) => r.getLong(0))(longEnc)
      .mapGroupsWithState[UserScd, UserScd](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Row], state: GroupState[UserScd]) =>
          var cur = state.getOption.getOrElse(UserScd(user, 0L, null, 0L, 0L))
          rows.toSeq
            .sortBy(r => (Math.floorDiv(r.getLong(2), 1000L), r.getLong(1)))
            .foreach { r =>
              val tsUs = Math.floorDiv(r.getLong(2), 1000L)
              val typ = r.getString(3)
              cur =
                if (cur.version == 0L || cur.event_type != typ)
                  UserScd(user, cur.version + 1, typ, tsUs, 1L)
                else cur.copy(n_events = cur.n_events + 1)
            }
          state.update(cur)
          cur
      }
  }

  /** Batch = streaming consistency contract: the streaming plans above
    * run unchanged on a batch DataFrame (no watermark semantics in
    * batch). Used by tests to pin output equality. */
  def windowedCountsBatch(events: DataFrame, width: String = "1 hour"): DataFrame =
    Events.tumblingAgg(events.withColumn("ets", Events.tsFromNanos(col("ts"))), col("ets"), width)
}
