package graft.compact

import org.apache.hadoop.fs.{FileSystem, Path}

/** The create-only versioned-pointer commit protocol every persisted
  * store shares (IvfStore, NswSearch, IndexStore, ClusterRepStore,
  * MaterializedAgg's `_agg-`): state lands in seq-named artifacts, the
  * empty `<prefix><seq>` pointer file is CREATED LAST, readers resolve
  * the highest pointer, and superseded pointers are reclaimed after a
  * seal. Extracted (round-14 review) so the crash contract lives in ONE
  * place — the pointer create uses overwrite=false, which object stores
  * implement as a conditional PUT, so two sealers racing the same seq
  * collide on the same object name and the loser throws.
  */
final case class VersionedPointer(prefix: String) {

  private val re = (java.util.regex.Pattern.quote(prefix) + "(\\d+)").r

  /** The pointer seq encoded in `name`, if `name` is one of ours. */
  def seqOf(name: String): Option[Long] =
    re.findFirstMatchIn(name).map(_.group(1).toLong)

  /** Newest sealed seq at `path` (None: nothing sealed / no dir). */
  def resolve(fs: FileSystem, path: String): Option[Long] = {
    val base = new Path(path)
    if (!fs.exists(base)) None
    else fs.listStatus(base).flatMap(e => seqOf(e.getPath.getName)).sorted.lastOption
  }

  /** Seal `seq` — strict create-only: a concurrent sealer of the same
    * seq makes this throw (FileAlreadyExistsException, an IOException).
    */
  def seal(fs: FileSystem, path: String, seq: Long): Unit =
    fs.create(new Path(path, s"$prefix$seq"), false).close()

  /** Seal `seq`, tolerating an existing pointer — the idempotent-reseal
    * variant a single-maintainer store uses when a rebuild at an
    * unchanged head seq legitimately re-seals (MaterializedAgg's
    * spec-drift fallback).
    */
  def sealIdempotent(fs: FileSystem, path: String, seq: Long): Unit =
    if (!fs.exists(new Path(path, s"$prefix$seq"))) seal(fs, path, seq)

  /** Delete pointer FILES older than `seq` (data-dir reclaim stays with
    * the store — only it knows which artifacts a live ledger still
    * references). Best-effort, like every post-seal reclaim.
    */
  def reclaimBelow(fs: FileSystem, path: String, seq: Long): Unit =
    fs.listStatus(new Path(path)).foreach { e =>
      if (seqOf(e.getPath.getName).exists(_ < seq)) {
        try { fs.delete(e.getPath, false); () } catch { case _: Throwable => () }
      }
    }
}

object VersionedPointer {
  /** The store-standard `_current-<seq>` pointer. */
  val Current: VersionedPointer = VersionedPointer("_current-")
}
