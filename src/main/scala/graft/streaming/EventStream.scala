package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` shape.
  *
  * The reference is a batch CronJob with no streaming abstraction
  * (SURVEY.md §2.2 "streaming" row); its late-data story is the 5-day
  * freshness gate. This module is the streaming-native equivalent for
  * the extended engine: file-source `readStream` → event-time windowed
  * aggregation with a watermark (bounded state at scale), plus custom
  * session state via `flatMapGroupsWithState` — state is partitioned by
  * user_id, so it scales horizontally with executors.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
  ))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  final case class SessionState(startMs: Long, lastMs: Long, nEvents: Long, totalValue: Double)

  final case class UserSession(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double,
  )

  /** File-source stream of parquet event batches dropped into `dir`. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", 4)
      .parquet(dir)

  /** Tumbling event-time counts with a watermark: late data beyond
    * `lateness` is dropped and window state is reclaimed — the property
    * that keeps state bounded on an unbounded stream.
    */
  def hourlyStats(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(
        col("window.start").as("bucket"),
        col("event_type"),
        col("n_events"),
        col("total_value"),
      )

  /** Built-in session windows: the declarative form of [[sessionize]] for
    * the common case (gap-merged per-key sessions with standard
    * aggregates). Prefer this when no custom state shape is needed —
    * Catalyst owns the state store layout and merge, and the watermark
    * bounds state exactly as in [[hourlyStats]]. [[sessionize]] remains
    * the escape hatch for semantics `session_window` can't express
    * (list-valued state, bridging emission rules, custom timeouts).
    */
  def sessionWindows(events: DataFrame, gapMinutes: Int, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"),
        col("total_value"),
      )

  /** Sessionization with explicit state. Sessions are held in the state
    * store until the WATERMARK passes `last event + gap` — only then are
    * they emitted (append mode cannot retract, so emitting a session the
    * moment a gap appears within a batch would be wrong: a late-but-
    * in-watermark event may still belong to it). State is a session
    * LIST per user, merged interval-style, so late events extend or
    * bridge existing sessions correctly.
    */
  def sessionize(spark: SparkSession, events: DataFrame, gapMinutes: Int, lateness: String = "10 minutes"): Dataset[UserSession] = {
    import spark.implicits._
    val gapMs = gapMinutes.toLong * 60000L

    def update(userId: Long, it: Iterator[Event], state: GroupState[Seq[SessionState]]): Iterator[UserSession] = {
      def emit(s: SessionState) =
        UserSession(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.nEvents, s.totalValue)

      val wm = state.getCurrentWatermarkMs()
      val existing = state.getOption.getOrElse(Seq.empty)
      val points = it.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1L, e.value)).toSeq
      // interval merge with gap tolerance (inputs sorted by start)
      val merged = scala.collection.mutable.ListBuffer.empty[SessionState]
      (existing ++ points).sortBy(s => (s.startMs, s.lastMs)).foreach { s =>
        if (merged.nonEmpty && s.startMs - merged.last.lastMs <= gapMs) {
          val p = merged.remove(merged.size - 1)
          merged += SessionState(
            math.min(p.startMs, s.startMs), math.max(p.lastMs, s.lastMs),
            p.nEvents + s.nEvents, p.totalValue + s.totalValue,
          )
        } else merged += s
      }
      // a session is final once no in-watermark event can still touch it
      val (closed, open) = merged.partition(_.lastMs + gapMs <= wm)
      if (open.nonEmpty) {
        state.update(open.toSeq)
        state.setTimeoutTimestamp(open.map(_.lastMs + gapMs).min)
      } else state.remove()
      closed.iterator.map(emit)
    }

    events
      .withWatermark("ts", lateness)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
