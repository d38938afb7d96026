package graft.compact

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/** ONE lifecycle tick that drives EVERY subscribed consumer of a
  * manifest leaf — N materialized aggregates AND the CDC-synced search
  * index — from the SAME [[ChangeFeed]] window, with the window's
  * changed bytes materialized ONCE (round-14 prescription 6 /
  * ROADMAP 97).
  *
  * Without this, each consumer holds its own cursor and pays its own
  * read of the same commit window: at 100 TB, "downstream of one leaf"
  * becomes K reads of every arrival. The tick:
  *
  *   1. resolves ONE ChangeSet from the INDEX's sealed cursor (the
  *      index persists a real cursor; agg states record an equivalent
  *      file ledger — in the steady state where this tick is the only
  *      driver, all consumers sit at the same window);
  *   2. materializes the window's four frames (appended/removed data
  *      rows, deleted/restored sidecar rows) and persists them, forcing
  *      the read so every consumer below hits cached blocks;
  *   3. seals the index generation from those frames
  *      ([[graft.operators.IndexStore.applyChanges]]);
  *   4. refreshes every aggregate with the frames SEEDED into
  *      [[MaterializedAgg.refreshAll]]'s delta cache — a spec whose
  *      window matches reads zero bytes; a spec that lags (built
  *      later, missed ticks) still reads its own window, so exactness
  *      never depends on the seed.
  *
  * Consumers keep their individual crash contracts: the index's cursor
  * seals with its generation, each agg state seals pointer-last, and a
  * tick that dies between consumers simply leaves the survivors one
  * window behind — the next tick's ChangeSet re-delivers (the index
  * replay is idempotent by cursor; agg ledgers diff exactly).
  * SyncTickSpec pins the lockstep seq, the shared-read proof (a
  * sentinel seed frame visibly feeds the fold), and exactness through
  * an arrival + MoR-delete + fold window.
  */
object SyncTick {

  final case class TickResult(
      leafSeq: Long,
      mode: String, // the window's feed mode: "noop" | "walk" | "diff"
      agg: Seq[MaterializedAgg.RefreshResult],
      indexMode: Option[String], // None = no index subscribed
  )

  /** Drive `specs` (materialized aggregates, already built) and the
    * index at `indexPath` (already bootstrapped by
    * [[graft.operators.IndexStore.syncFromLeaf]]) to `leaf`'s head off
    * one window read. Bootstrap belongs to the consumers' own APIs —
    * first contact is a full read however it is driven.
    */
  def tick(
      spark: SparkSession,
      leaf: String,
      specs: Seq[MaterializedAgg.AggSpec],
      indexPath: Option[String],
  ): TickResult = {
    val cursor = indexPath match {
      case Some(p) =>
        graft.operators.IndexStore.feedCursor(spark, p).getOrElse(
          throw new IllegalStateException(
            s"index at $p has no sealed feed cursor — bootstrap with IndexStore.syncFromLeaf before ticking"),
        )
      case None => ChangeFeed.Cursor.atHead(spark, leaf) // agg-only tick: refreshAll shares internally
    }
    val ch = ChangeFeed.changesSince(spark, leaf, cursor)
    if (ch.mode == "noop")
      return TickResult(ch.next.seq, "noop", MaterializedAgg.refreshAll(spark, leaf, specs), indexPath.map(_ => "noop"))

    // materialize the window ONCE; force the reads so every consumer
    // below folds from cached blocks, not from the files
    val dataFrames: Map[Seq[String], DataFrame] =
      Seq(ch.appended, ch.removed).filter(_.nonEmpty)
        .map(fls => fls -> MaterializedAgg.readWithFile(spark, fls).persist()).toMap
    val delFrames: Map[Seq[String], DataFrame] =
      Seq(ch.deleted, ch.restored).filter(_.nonEmpty)
        .map(fls => fls -> ManifestCommit.readDeleteRows(spark, leaf, fls).persist()).toMap
    (dataFrames.values ++ delFrames.values).foreach { df => df.count(); () }
    try {
      val indexMode = indexPath.map { p =>
        def clean(df: DataFrame) = df.drop("_file", "_delete_file")
        // allowMissingColumns: the data and sidecar frames each merge
        // their own files' schemas (mid-evolution windows differ)
        val added = Seq(dataFrames.get(ch.appended), delFrames.get(ch.restored))
          .flatten.map(clean).reduceOption(_.unionByName(_, allowMissingColumns = true))
        val removed = Seq(dataFrames.get(ch.removed), delFrames.get(ch.deleted))
          .flatten.map(clean).reduceOption(_.unionByName(_, allowMissingColumns = true))
        graft.operators.IndexStore.applyChanges(spark, p, ch, added, removed)
        ch.mode
      }
      val agg = MaterializedAgg.refreshAll(
        spark, leaf, specs, seedData = dataFrames, seedDeleteRows = delFrames)
      TickResult(ch.next.seq, ch.mode, agg, indexMode)
    } finally {
      (dataFrames.values ++ delFrames.values).foreach { df => df.unpersist(); () }
    }
  }
}
