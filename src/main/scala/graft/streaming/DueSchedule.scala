package graft.streaming

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}

/** Bounded driver-side schedule of dirty leaves for [[CompactionStream]].
  *
  * The unbounded risk it removes: a store with 10⁶+ leaves booking
  * last-write-then-quiet compactions would grow the old driver map
  * without limit. Here at most `cap` entries are resident — the
  * soonest-due window, the only part planning ever consults — and the
  * FULL booked set lives in the snapshot file next to the checkpoint
  * (same `dueMs<TAB>leaf` format as before, still atomic tmp+rename).
  * Overflow beyond the window spills to disk and is pulled back as the
  * window drains.
  *
  * Memory stays bounded even during snapshot rewrites: the file is kept
  * sorted by leaf, so a rewrite is a streaming merge-join of the old
  * file with this batch's sorted updates, tracking the next window with
  * a size-`cap` heap — never the whole set.
  *
  * Write-ordering invariant that makes the refill cheap: values only
  * ever grow (bookings max-merge), and an entry is only evicted when it
  * is the LATEST-due resident — so every spilled entry is due at or
  * after every resident one, and the window only needs a disk read when
  * it drains completely.
  *
  * Durability matches the old map: best-effort. A failed rewrite keeps
  * every pending change buffered for the next flush; a lost snapshot is
  * recovered by `catchUpOnStart`. Single-threaded use (micro-batches
  * run one at a time on the driver).
  */
private[streaming] final class DueSchedule(fs: FileSystem, file: Path, cap: Int) {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  // resident window: the `cap` soonest (dueMs, leaf) entries
  private val mem = mutable.TreeSet.empty[(Long, String)]
  private val idx = mutable.HashMap.empty[String, Long]
  // booked past the cap (or evicted), destined for disk at next rewrite
  private val pendingBook = mutable.HashMap.empty[String, Long]
  // leaf -> dueMs it was SERVED at. Two reasons this is a map, not a
  // set: (1) a disk entry booked LATER than the served time is a
  // booking the serve did not cover (a new arrival pushed the due time
  // out while an earlier-due copy was being taken) — the final rewrite
  // must keep it or the leaf strands forever (the mtime-window source
  // never re-emits); (2) mid-batch refill rewrites must keep served
  // leaves on disk until the post-processing flush, so a driver crash
  // between serve and compaction re-books them on restart.
  private val pendingRemove = mutable.HashMap.empty[String, Long]
  // entries that exist ONLY in the snapshot file
  private var spilled = 0
  private var dirty = false

  restoreWindow()

  /** Book (or extend) a leaf's due time. Values max-merge, matching the
    * old map semantics: a newer arrival can only push the due time out.
    */
  def book(leaf: String, dueMs: Long): Unit = {
    pendingRemove -= leaf // a re-arrival after processing re-books
    idx.get(leaf) match {
      case Some(prev) =>
        if (dueMs > prev) {
          mem -= ((prev, leaf)); mem += ((dueMs, leaf)); idx(leaf) = dueMs
          dirty = true
        }
      case None if pendingBook.contains(leaf) =>
        if (dueMs > pendingBook(leaf)) { pendingBook(leaf) = dueMs; dirty = true }
      case None =>
        // the leaf may also sit spilled on disk; the rewrite max-merges
        mem += ((dueMs, leaf)); idx(leaf) = dueMs
        if (mem.size > cap) {
          val evict = mem.last
          mem -= evict; idx -= evict._2
          pendingBook(evict._2) = math.max(pendingBook.getOrElse(evict._2, 0L), evict._1)
        }
        dirty = true
    }
  }

  /** Remove and return up to `max` leaves due at or before `nowMs`,
    * soonest first. Refills the window from the spilled snapshot when it
    * drains, so a one-shot drain loop reaches EVERY due leaf, resident
    * or spilled.
    */
  def takeReady(nowMs: Long, max: Int): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var continue = true
    while (continue) {
      while (mem.nonEmpty && mem.head._1 <= nowMs && out.size < max) {
        val (ms, leaf) = mem.head
        mem -= ((ms, leaf)); idx -= leaf
        pendingRemove(leaf) = math.max(pendingRemove.getOrElse(leaf, Long.MinValue), ms)
        out += leaf
        dirty = true
      }
      continue = false
      // every spilled entry is due >= every resident one, so a refill
      // can only surface more ready work once the window is empty. The
      // refill rewrite keeps served leaves on disk (dropTaken=false):
      // they are removed only by the post-processing flush, so a crash
      // between serve and compaction re-books them on restart.
      if (out.size < max && mem.isEmpty && (spilled > 0 || pendingBook.nonEmpty)) {
        if (rewrite(dropTaken = false)) continue = mem.nonEmpty && mem.head._1 <= nowMs
        else {
          // degraded drain: the snapshot is unwritable, so serve ready
          // buffered entries directly (they are resident anyway);
          // disk-spilled entries wait for the FS to heal — planning is
          // idempotent and catchUpOnStart covers a lost snapshot
          pendingBook.toSeq.map { case (l, ms) => (ms, l) }.sorted
            .filter(_._1 <= nowMs).take(max - out.size)
            .foreach { case (ms, leaf) =>
              pendingBook -= leaf
              pendingRemove(leaf) = math.max(pendingRemove.getOrElse(leaf, Long.MinValue), ms)
              out += leaf
              dirty = true
            }
        }
      }
    }
    out.toSeq
  }

  /** Persist pending changes (no-op when nothing moved — continuous
    * triggers fire constantly and must not rewrite an unchanged file).
    * Called AFTER batch processing, so dropping served leaves is safe.
    */
  def flush(): Unit = { if (dirty) { rewrite(dropTaken = true); () } }

  /** Resident entries — bounded by `cap`; tests pin the bound here. */
  def residentCount: Int = mem.size

  /** Entries living only in the snapshot file. */
  def spilledCount: Int = spilled

  /** Rebuild the resident window from the snapshot file (startup path). */
  private def restoreWindow(): Unit =
    try {
      mem.clear(); idx.clear(); spilled = 0
      if (fs.exists(file)) {
        val window = mutable.PriorityQueue.empty[(Long, String)] // max-heap
        var total = 0
        val in = fs.open(file)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().foreach { line =>
          parseLine(line).foreach { e =>
            total += 1
            window.enqueue((e._2, e._1))
            if (window.size > cap) { window.dequeue(); () }
          }
        }
        finally in.close()
        window.foreach { case (ms, leaf) => mem += ((ms, leaf)); idx(leaf) = ms }
        spilled = total - mem.size
      }
    } catch {
      case e: Throwable =>
        System.err.println(s"[compact-stream] could not load due schedule $file (${e.toString}); starting empty")
        mem.clear(); idx.clear(); spilled = 0
    }

  private def parseLine(line: String): Option[(String, Long)] = {
    val i = line.indexOf('\t')
    if (i <= 0) None else Some(line.substring(i + 1) -> line.substring(0, i).toLong)
  }

  /** Streaming snapshot rewrite: merge-join the sorted-by-leaf file with
    * this batch's sorted updates/removals into a tmp file, then rename.
    * Tracks the next resident window (the `cap` smallest due times) with
    * a bounded heap during the same pass. On success the pending buffers
    * clear; on failure everything stays buffered for the next attempt
    * and the resident window is untouched. Returns success.
    *
    * `dropTaken` picks the serve-accounting mode:
    *   - true (post-batch flush): a served leaf's disk entry is dropped
    *     — UNLESS the entry is booked LATER than the time it was served
    *     at, which means a new arrival extended the booking while the
    *     earlier-due copy was in flight; that entry stays (off-window
    *     until its own serve) or the leaf would strand forever.
    *   - false (mid-batch refill): served leaves stay on disk, excluded
    *     from the rebuilt window so the same batch can't serve them
    *     twice; pendingRemove survives (and keeps the schedule dirty)
    *     so the post-batch flush still drops them.
    */
  private def rewrite(dropTaken: Boolean): Boolean =
    try {
      val updates = (idx ++ pendingBook).toArray.sortBy(_._1)
      val tmp = new Path(file.getParent, s".${file.getName}.tmp")
      val window = mutable.PriorityQueue.empty[(Long, String)] // max-heap
      var total = 0
      val out = fs.create(tmp, true)
      try {
        val w = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(out, java.nio.charset.StandardCharsets.UTF_8),
        )
        def emit(leaf: String, ms: Long, resident: Boolean = true): Unit = {
          w.write(s"$ms\t$leaf\n")
          total += 1
          if (resident) {
            window.enqueue((ms, leaf))
            if (window.size > cap) { window.dequeue(); () }
          }
        }
        var ui = 0
        if (fs.exists(file)) {
          val in = fs.open(file)
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().foreach { line =>
            parseLine(line).foreach { case (leaf, ms) =>
              while (ui < updates.length && updates(ui)._1 < leaf) {
                emit(updates(ui)._1, updates(ui)._2); ui += 1
              }
              if (ui < updates.length && updates(ui)._1 == leaf) {
                // a re-booked leaf is never in pendingRemove (book()
                // clears it), so max-merge unconditionally
                emit(leaf, math.max(ms, updates(ui)._2)); ui += 1
              } else pendingRemove.get(leaf) match {
                case None => emit(leaf, ms)
                case Some(takenMs) =>
                  if (!dropTaken) emit(leaf, ms, resident = false)
                  else if (ms > takenMs) emit(leaf, ms)
                // else: this serve covered the booking — drop it
              }
            }
          }
          finally in.close()
        }
        while (ui < updates.length) { emit(updates(ui)._1, updates(ui)._2); ui += 1 }
        w.flush()
      } finally out.close()
      // local FS rename won't overwrite: drop the old snapshot first. A
      // crash in the gap loses one snapshot generation, which the next
      // changed batch rewrites.
      fs.delete(file, false)
      if (!fs.rename(tmp, file)) {
        System.err.println(s"[compact-stream] could not publish due schedule $file (rename failed)")
        false
      } else {
        mem.clear(); idx.clear()
        window.foreach { case (ms, leaf) => mem += ((ms, leaf)); idx(leaf) = ms }
        spilled = total - mem.size
        pendingBook.clear()
        if (dropTaken) { pendingRemove.clear(); dirty = false }
        else dirty = pendingRemove.nonEmpty // served leaves still owe their removal
        true
      }
    } catch {
      case e: Throwable =>
        System.err.println(s"[compact-stream] could not persist due schedule $file (${e.toString})")
        false
    }
}
