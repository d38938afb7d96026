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

  /** Sessionization with explicit state: a session closes when no event
    * arrives for `gapMinutes` (tracked via event-time timeout against
    * the watermark). Closed sessions are emitted downstream; open ones
    * live in the state store.
    */
  def sessionize(spark: SparkSession, events: DataFrame, gapMinutes: Int, lateness: String = "10 minutes"): Dataset[UserSession] = {
    import spark.implicits._
    val gapMs = gapMinutes.toLong * 60000L

    def update(userId: Long, it: Iterator[Event], state: GroupState[SessionState]): Iterator[UserSession] = {
      def emit(s: SessionState) =
        UserSession(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.nEvents, s.totalValue)

      if (state.hasTimedOut) {
        val out = state.getOption.map(emit).iterator
        state.remove()
        return out
      }

      val sorted = it.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[UserSession]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastMs <= gapMs =>
            cur = Some(SessionState(s.startMs, math.max(s.lastMs, t), s.nEvents + 1, s.totalValue + e.value))
          case Some(s) =>
            closed ::= emit(s)
            cur = Some(SessionState(t, t, 1L, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1L, e.value))
        }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          // close when the watermark passes last-event + gap
          state.setTimeoutTimestamp(s.lastMs + gapMs)
        case None => state.remove()
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", lateness)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
