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

  /** Streaming interval-OVERLAP join with NO equality key (ROADMAP 35):
    * the stream-stream form of
    * [[graft.queries.EventQueries.overlapJoinAgg]]'s grid-cell rewrite.
    *
    * A declarative stream-stream overlap join (`a.s < b.e AND b.s <
    * a.e`) has no equi-key, so every stored row of one side must be
    * compared against every arriving row of the other — per-batch work
    * proportional to the whole retained state. Quantizing both sides
    * onto a grid no finer than the (bounded) interval length and
    * equi-joining on the cell makes the state lookup a hash probe: an
    * arriving interval touches ≤ 2 cells and meets only the rows
    * sharing them, the batch kernel's candidate bound carried over
    * unchanged (candidates are a lossless superset — overlapping
    * intervals share the cell containing their intersection — and the
    * exact predicate prunes them).
    *
    * State stays bounded by the WATERMARK, which needs a time-range
    * linking the two sides' event times: overlap of intervals no
    * longer than `maxIntervalSeconds` implies `|a.s − b.s| <
    * maxIntervalSeconds`, so that symmetric bound is part of the join
    * condition — Spark evicts either side's state once the other
    * side's watermark passes it. A pair can meet in 2 cells (one
    * straddle each), so the join feeds a watermark-scoped pair dedup
    * (`dropDuplicatesWithinWatermark`) — legal in append mode because
    * a duplicate can only arrive within the watermark of the first
    * emission (both copies come from the same bounded join window).
    *
    * Inputs: frames `(a_id, a_s, a_e)` / `(b_id, b_s, b_e)` with
    * half-open [s, e), e − s ≤ maxIntervalSeconds, NOT yet
    * watermarked. `cellSeconds` ≥ maxIntervalSeconds keeps the explode
    * factor ≤ 2. Output: distinct overlapping `(a_id, b_id)` pairs.
    */
  def overlapJoinStream(
      a: DataFrame,
      b: DataFrame,
      cellSeconds: Long,
      maxIntervalSeconds: Long,
      lateness: String = "1 hour",
  ): DataFrame = {
    require(cellSeconds >= maxIntervalSeconds, s"cellSeconds ($cellSeconds) must cover maxIntervalSeconds ($maxIntervalSeconds)")
    val cellUs = cellSeconds * 1000000L
    def cells(df: DataFrame, s: String, e: String) = df.withColumn(
      "cell",
      explode(expr(s"sequence(unix_micros($s) div $cellUs, (unix_micros($e) - 1) div $cellUs)")),
    )
    val aw = cells(a.withWatermark("a_s", lateness), "a_s", "a_e")
    val bw = cells(b.withWatermark("b_s", lateness), "b_s", "b_e")
    aw.join(
      bw,
      aw("cell") === bw("cell") &&
        // exact half-open overlap
        col("a_s") < col("b_e") && col("b_s") < col("a_e") &&
        // symmetric start-time bound: the range condition the state
        // eviction needs (implied by overlap + bounded length)
        col("a_s") >= col("b_s") - expr(s"INTERVAL $maxIntervalSeconds SECONDS") &&
        col("a_s") <= col("b_s") + expr(s"INTERVAL $maxIntervalSeconds SECONDS"),
    )
      .select(col("a_id"), col("b_id"), col("a_s"))
      .dropDuplicatesWithinWatermark("a_id", "b_id")
      .select(col("a_id"), col("b_id"))
  }

  /** Multi-level variant of [[overlapJoinStream]] for HETEROGENEOUS
    * interval lengths — the streaming port of
    * [[graft.queries.EventQueries.overlapJoinAggLevels]]'s register/
    * probe discipline. One grid makes Σcells = Σ len/cell: a single
    * day-long interval on a minute grid explodes to 1440 state rows.
    * Here level ℓ has cell size base·2^ℓ (ℓ < `levels`); each interval
    * REGISTERS on the smallest level whose cell covers its length (≤ 2
    * cells) and PROBES every level at or above its own (≤ 3 cells per
    * coarser level), so per-interval state and join fan-out are
    * O(levels) for ANY length mix. A pair (x, y) with lvl(x) ≤ lvl(y)
    * meets where x probes y's registration level — candidates are
    * probeA⋈regB ∪ regA⋈probeB, a lossless superset pruned by the exact
    * half-open predicate, then deduped within the watermark exactly as
    * in the single-grid form (a pair can meet in several (lvl, cell)
    * keys and in both branches at equal levels).
    *
    * The watermark story is unchanged: overlap of intervals no longer
    * than `maxIntervalSeconds` implies `|a_s − b_s| < maxIntervalSeconds`
    * regardless of level, so the same symmetric start-time bound drives
    * state eviction in both joins. The top-level cell must cover
    * `maxIntervalSeconds` to keep the ≤ 2-cell registration bound.
    *
    * Inputs as in [[overlapJoinStream]]: `(a_id, a_s, a_e)` /
    * `(b_id, b_s, b_e)`, half-open, NOT yet watermarked. Output:
    * distinct overlapping `(a_id, b_id)` pairs.
    */
  def overlapJoinStreamLevels(
      a: DataFrame,
      b: DataFrame,
      baseCellSeconds: Long,
      levels: Int,
      maxIntervalSeconds: Long,
      lateness: String = "1 hour",
  ): DataFrame = {
    require(levels >= 1, s"levels must be >= 1: $levels")
    val baseUs = baseCellSeconds * 1000000L
    require(
      maxIntervalSeconds * 1000000L <= (baseUs << (levels - 1)),
      s"top-level cell (base $baseCellSeconds s x 2^${levels - 1}) must cover maxIntervalSeconds ($maxIntervalSeconds)",
    )
    // the batch kernel's lvl/reg/probe, parameterized by column names
    def lvl(df: DataFrame, s: String, e: String) = df.withColumn(
      "lvl",
      least(
        greatest(
          ceil(log(2.0, (unix_micros(col(e)) - unix_micros(col(s))).cast("double") / baseUs)).cast("int"),
          lit(0),
        ),
        lit(levels - 1),
      ),
    )
    def cellsAt(s: String, e: String, levelCol: String) =
      s"sequence(unix_micros($s) div ($baseUs * shiftleft(1L, $levelCol)), (unix_micros($e) - 1) div ($baseUs * shiftleft(1L, $levelCol)))"
    def reg(df: DataFrame, s: String, e: String) = lvl(df, s, e)
      .withColumn("cell", explode(expr(cellsAt(s, e, "lvl"))))
    def probe(df: DataFrame, s: String, e: String) = lvl(df, s, e)
      .withColumn("plvl", explode(expr(s"sequence(lvl, ${levels - 1})")))
      .withColumn("cell", explode(expr(cellsAt(s, e, "plvl"))))
      .withColumn("lvl", col("plvl"))
      .drop("plvl")
    val aw = a.withWatermark("a_s", lateness)
    val bw = b.withWatermark("b_s", lateness)
    def meet(x: DataFrame, y: DataFrame) =
      x.as("x").join(
        y.as("y"),
        col("x.lvl") === col("y.lvl") && col("x.cell") === col("y.cell") &&
          col("a_s") < col("b_e") && col("b_s") < col("a_e") &&
          col("a_s") >= col("b_s") - expr(s"INTERVAL $maxIntervalSeconds SECONDS") &&
          col("a_s") <= col("b_s") + expr(s"INTERVAL $maxIntervalSeconds SECONDS"),
      ).select(col("a_id"), col("b_id"), col("a_s"))
    meet(probe(aw, "a_s", "a_e"), reg(bw, "b_s", "b_e"))
      .unionByName(meet(reg(aw, "a_s", "a_e"), probe(bw, "b_s", "b_e")))
      .dropDuplicatesWithinWatermark("a_id", "b_id")
      .select(col("a_id"), col("b_id"))
  }
}
