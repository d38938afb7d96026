package graft.compact

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-leaf ATOMIC publish — the catalog-root pointer over per-leaf
  * head seqs (the [[VersionedPointer]] discipline one level up, with
  * content: Iceberg's catalog / Delta's `_last_checkpoint` shape,
  * dependency-free).
  *
  * Every [[ManifestCommit]] commit is single-leaf atomic; a dataset
  * spanning leaves (a data leaf + its quarantine leaf, partitioned
  * leaves, a table + its downstream rollup) has no cross-leaf publish —
  * a reader can observe leaf A's new commit beside leaf B's old one.
  * This module adds the missing boundary: a SNAPSHOT file
  * `_cat-<seq>.json` at a catalog root pins each member leaf to a head
  * seq, and catalog readers resolve every leaf THROUGH the pin
  * ([[ManifestCommit.readLeafAt]]) — all-or-nothing across leaves.
  *
  * Protocol (one object create IS the commit point):
  *   1. run the per-leaf commits as usual (WAP appends, merges,
  *      deletes, compactions) — each atomic on its own leaf, but
  *      invisible to CATALOG readers, who are still pinned;
  *   2. capture each touched leaf's new head seq;
  *   3. [[publish]] — ONE create-only PUT of the next `_cat-<seq>.json`
  *      carrying the updated pins merged over the carried-forward rest.
  *
  * Crash matrix:
  *   - death between leaf commits and publish: catalog readers see
  *     old-EVERYTHING (the sealed leaf commits are future state only
  *     direct leaf readers observe); re-running the publish heals;
  *   - torn snapshot upload: fails the seal-mark check, ignored —
  *     readers resolve the previous snapshot;
  *   - two writers racing seq S+1: same object name, create-only —
  *     the loser gets [[ConcurrentCommitException]] and rolls back;
  *   - a SLOW racer colliding as an unsealed file: the next publish
  *     waits a bounded window for it to seal (abort if it does), and
  *     after sealing audits every seq it skipped — a racer that sealed
  *     late makes this publish retract itself and throw, so a racing
  *     loser ALWAYS surfaces as [[ConcurrentCommitException]], never
  *     as silently-dropped pins ([[publish]] guards 1 and 2).
  *
  * Retention: a pinned read is [[ManifestCommit.readLeafAt]], so leaf
  * lifecycle must keep superseded files for as long as a catalog
  * snapshot pins a pre-rewrite seq — run member leaves with
  * `retainSuperseded` and expire ONLY past [[oldestPin]] (the same
  * contract the ChangeFeed retraction reader documents).
  */
object CatalogCommit {

  private val sealMark = "\"sealed\":true}"
  private val nameRe = "_cat-(\\d+)\\.json".r

  /** One sealed catalog snapshot: `leaves` maps member leaf paths
    * (RELATIVE to the catalog root, so catalogs stay movable) to the
    * head seq the snapshot pins them at.
    */
  final case class Snapshot(seq: Long, leaves: Map[String, Long])

  private def snapName(seq: Long) = f"_cat-$seq%09d.json"
  private[compact] def seqOf(name: String): Option[Long] = name match {
    case nameRe(d) => Some(d.toLong)
    case _         => None
  }

  private def fsFor(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def parse(fs: FileSystem, p: Path): Option[Snapshot] = {
    val text =
      try {
        val in = fs.open(p)
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      } catch { case _: Throwable => return None }
    if (!text.endsWith(sealMark)) return None
    val seq = """"seq":(\d+)""".r.findFirstMatchIn(text).map(_.group(1).toLong).getOrElse(return None)
    val leaves = """\{"p":"([^"]+)","s":(\d+)\}""".r.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
    Some(Snapshot(seq, leaves))
  }

  /** The newest sealed snapshot (None: never published). Torn or
    * garbled snapshot files step down to the previous sealed one.
    */
  def current(spark: SparkSession, root: String): Option[Snapshot] = {
    val fs = fsFor(spark, root)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return None
    fs.listStatus(rootPath)
      .filter(e => e.isFile && seqOf(e.getPath.getName).isDefined)
      .sortBy(e => seqOf(e.getPath.getName).get)(Ordering[Long].reverse)
      .iterator.flatMap(e => parse(fs, e.getPath)).nextOption()
  }

  /** A specific sealed snapshot — catalog time travel. */
  def snapshotAt(spark: SparkSession, root: String, seq: Long): Option[Snapshot] = {
    val fs = fsFor(spark, root)
    val p = new Path(s"$root/${snapName(seq)}")
    if (fs.exists(p)) parse(fs, p) else None
  }

  /** Publish the next snapshot: `updates` (leaf rel → new head seq)
    * merged over the current snapshot's carried-forward pins. The ONE
    * create-only PUT is the cross-leaf commit point; a racer stamping
    * the same seq makes the loser throw [[ConcurrentCommitException]].
    *
    * An existing-but-UNSEALED `_cat-<seq>.json` at the next name is
    * ambiguous: debris from a writer that died mid-upload, or a live
    * racer still uploading — the two look identical at the moment of
    * collision. Burning the seq on sight (the first cut) silently
    * dropped a slow racer's pins from the chain: the racer would seal
    * later and return success, yet every future snapshot skipped its
    * updates. Two guards close that window (advice r16):
    *
    *   1. bounded re-check — wait up to `debrisWaitMs` for the
    *      colliding file to seal; a racer that seals inside the window
    *      aborts THIS publish with [[ConcurrentCommitException]] (the
    *      caller re-resolves and re-publishes over the racer's pins);
    *   2. post-seal audit, BOTH sides of the race — after sealing,
    *      (a) if any seq this publish skipped past turned out SEALED
    *      (a racer slower than the window), and (b) if a sealed
    *      snapshot ABOVE ours exists that does not incorporate our
    *      pins (a faster publisher burned OUR in-flight seq and moved
    *      on), this publish retracts its own snapshot (best-effort
    *      delete — readers resolve the other chain) and throws. Either
    *      way the racing loser ALWAYS gets the exception, never a
    *      silent pin loss. The burned-seq half only runs when a seq
    *      was actually burned; the skipped-us half costs one
    *      current() listing per publish — metadata-scale, and the
    *      price of the guarantee.
    */
  def publish(
      spark: SparkSession,
      root: String,
      updates: Map[String, Long],
      debrisWaitMs: Long = 1000L,
  ): Snapshot =
    publishImpl(spark, root, updates, debrisWaitMs, onSeqBurned = _ => ())

  /** [[publish]] with two test seams for deterministic race
    * interleavings: `onSeqBurned` fires after a seq is classified as
    * debris and burned (before the create at the next); `onCreated`
    * fires after our create lands but BEFORE the body is written — the
    * window in which a faster publisher sees us as unsealed debris.
    */
  private[compact] def publishImpl(
      spark: SparkSession,
      root: String,
      updates: Map[String, Long],
      debrisWaitMs: Long,
      onSeqBurned: Long => Unit,
      onCreated: Long => Unit = _ => (),
  ): Snapshot = {
    require(updates.nonEmpty, "a catalog publish must pin at least one leaf")
    updates.keys.foreach(k =>
      require(
        !k.exists(c => c == '"' || c == '\\' || c == ']' || c == ','),
        s"unencodable leaf path: $k",
      ))
    val fs = fsFor(spark, root)
    fs.mkdirs(new Path(root))
    val cur = current(spark, root)
    val curSeq = cur.map(_.seq).getOrElse(0L)
    val base = cur.map(_.leaves).getOrElse(Map.empty) ++ updates
    var seq = curSeq + 1L
    var attempts = 0
    while (true) {
      val next = Snapshot(seq, base)
      val body = next.leaves.toSeq.sortBy(_._1)
        .map { case (p, s) => s"""{"p":"$p","s":$s}""" }
        .mkString("[", ",", "]")
      val json = s"""{"seq":${next.seq},"leaves":$body,""" + sealMark
      val target = new Path(s"$root/${snapName(next.seq)}")
      val created =
        try Some(fs.create(target, false))
        catch {
          case e: java.io.IOException =>
            if (!fs.exists(target)) throw e // transient IO stays IO
            if (parse(fs, target).isDefined)
              throw new ConcurrentCommitException(root, next.seq, "unknown")
            // guard 1: give a live racer its upload window before
            // declaring the file dead debris
            val deadline = System.nanoTime() + debrisWaitMs * 1000000L
            var sealedLate = false
            while (!sealedLate && System.nanoTime() < deadline) {
              Thread.sleep(math.max(1L, math.min(50L, debrisWaitMs)))
              sealedLate = parse(fs, target).isDefined
            }
            if (sealedLate)
              throw new ConcurrentCommitException(root, next.seq, "unknown")
            attempts += 1
            if (attempts > 64)
              throw new java.io.IOException(
                s"catalog $root: $attempts torn snapshot files in a row starting at " +
                  s"${snapName(seq - attempts + 1)} — reclaim the debris manually")
            onSeqBurned(seq)
            None // torn debris: burn the seq
        }
      created match {
        case Some(out) =>
          onCreated(next.seq)
          try out.write(json.getBytes(StandardCharsets.UTF_8))
          finally out.close()
          // guard 2, WINNER side: a burned seq that SEALED after the
          // window is a racer whose pins this snapshot never
          // incorporated — retract ours (readers resolve the racer's)
          // and fail loudly
          if (attempts > 0) {
            val lateSealed = ((curSeq + 1L) until next.seq)
              .find(s0 => parse(fs, new Path(s"$root/${snapName(s0)}")).isDefined)
            lateSealed.foreach { s0 =>
              try { fs.delete(target, false); () } catch { case _: Throwable => () }
              throw new ConcurrentCommitException(root, s0, "unknown")
            }
          }
          // guard 2, LOSER side (the symmetric half — without it a
          // SLOW writer whose in-flight file a faster publisher burned
          // would seal last, run no audit, and return success while
          // the winner's chain silently dropped its pins): if a sealed
          // snapshot ABOVE ours exists that does not carry every one
          // of our pins at-or-past our seqs, it skipped us — retract
          // ours and throw so the caller re-resolves over the winner.
          // A higher snapshot that DOES incorporate them was built on
          // our chain (or independently observed the same leaf heads):
          // nothing was lost, the publish stands.
          current(spark, root).filter(_.seq > next.seq).foreach { cur2 =>
            val dropped = updates.exists { case (leafRel, s0) =>
              !cur2.leaves.get(leafRel).exists(_ >= s0)
            }
            if (dropped) {
              try { fs.delete(target, false); () } catch { case _: Throwable => () }
              throw new ConcurrentCommitException(root, cur2.seq, "unknown")
            }
          }
          return next
        case None => seq += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** A member leaf read THROUGH the catalog pin: old-everything or
    * new-everything across the whole catalog, never a mix. Loud when
    * the leaf is not a member — a silent fall-through to head would
    * defeat the boundary.
    */
  def readLeaf(spark: SparkSession, root: String, leafRel: String): DataFrame =
    readLeafAt(spark, root, leafRel, current(spark, root)
      .getOrElse(throw new IllegalStateException(s"no sealed catalog snapshot at $root")))

  /** [[readLeaf]] against an explicit snapshot (time travel). */
  def readLeafAt(spark: SparkSession, root: String, leafRel: String, snap: Snapshot): DataFrame = {
    val pin = snap.leaves.getOrElse(
      leafRel,
      throw new IllegalArgumentException(
        s"leaf $leafRel is not a member of catalog $root at seq ${snap.seq} " +
          s"(members: ${snap.leaves.keys.toSeq.sorted.mkString(", ")})"),
    )
    ManifestCommit.readLeafAt(spark, s"$root/$leafRel", pin)
  }

  /** The oldest seq any retained snapshot pins `leafRel` at — the
    * expire horizon: [[ManifestCommit.expireSnapshots]] below this is
    * safe for every catalog reader; above it would break a pinned read.
    */
  def oldestPin(spark: SparkSession, root: String, leafRel: String): Option[Long] = {
    val fs = fsFor(spark, root)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return None
    val pins = fs.listStatus(rootPath)
      .filter(e => e.isFile && seqOf(e.getPath.getName).isDefined)
      .flatMap(e => parse(fs, e.getPath))
      .flatMap(_.leaves.get(leafRel))
    if (pins.isEmpty) None else Some(pins.min)
  }

  /** Retire snapshot files below `keepFrom` (their pinned reads become
    * unavailable — pair with the leaf-side expire horizon). Returns the
    * number removed.
    */
  def expire(spark: SparkSession, root: String, keepFrom: Long): Int = {
    val fs = fsFor(spark, root)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return 0
    fs.listStatus(rootPath)
      .filter(e => e.isFile && seqOf(e.getPath.getName).exists(_ < keepFrom))
      .count(e => try fs.delete(e.getPath, false) catch { case _: Throwable => false })
  }
}
