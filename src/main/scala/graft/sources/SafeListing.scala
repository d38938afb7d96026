package graft.sources

import java.io.FileNotFoundException

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Recursive listing that tolerates concurrent mutation.
  *
  * `FileSystem.listFiles(path, recursive=true)` materializes a
  * `LocatedFileStatus` per entry, which EAGERLY loads permissions — on
  * the local FS that shells out an `ls` per file, and on any FS it
  * throws if the file vanished between the directory scan and the stat.
  * Compaction deletes files behind its own listings constantly (and the
  * streaming trigger lists while merges commit), so a listing that dies
  * on a vanished file is wrong by design here.
  *
  * This walker uses plain `listStatus` (no permission load — metadata
  * the planner never reads) with an explicit stack, and retries a
  * directory whose listing raced a deletion: the re-list simply no
  * longer contains the vanished entry. A directory that vanished whole
  * contributes nothing.
  */
object SafeListing {

  def walk(fs: FileSystem, root: Path): Iterator[FileStatus] = {
    val stack = scala.collection.mutable.Stack(root)
    new Iterator[FileStatus] {
      private var buf: List[FileStatus] = Nil

      private def listRetrying(dir: Path): Array[FileStatus] = {
        var attempts = 3
        while (true) {
          try return fs.listStatus(dir)
          catch {
            case _: FileNotFoundException =>
              attempts -= 1
              // the dir itself is gone, or an entry vanished mid-stat;
              // re-list — a fresh snapshot can't contain the vanished
              // entry. If the dir is gone, the next attempt throws again
              // and we give up on it (empty).
              if (attempts <= 0 || !existsQuiet(dir)) return Array.empty
          }
        }
        Array.empty // unreachable
      }

      private def existsQuiet(p: Path): Boolean =
        try fs.exists(p)
        catch { case _: Throwable => false }

      private def advance(): Unit = {
        while (buf.isEmpty && stack.nonEmpty) {
          val entries = listRetrying(stack.pop())
          entries.foreach { s =>
            if (s.isDirectory) stack.push(s.getPath)
            else buf = s :: buf
          }
        }
      }

      override def hasNext: Boolean = { advance(); buf.nonEmpty }
      override def next(): FileStatus = {
        advance()
        val h = buf.head
        buf = buf.tail
        h
      }
    }
  }
}
