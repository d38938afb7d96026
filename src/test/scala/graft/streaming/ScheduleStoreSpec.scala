package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Unit semantics of the persisted due schedule (no Spark session):
  * round-trip fidelity, the two corruption behaviors, overwrite via
  * delete+rename, and the best-effort no-throw contract on a failing
  * FileSystem — the schedule is an optimization over catchUpOnStart,
  * so persistence failures must never take the stream down.
  */
class ScheduleStoreSpec extends AnyFunSuite with Matchers {

  private def withFs(f: (FileSystem, Path) => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-sched-store").toFile
    val p = new Path(new java.io.File(dir, "graft-due-schedule").getAbsolutePath)
    val fs = p.getFileSystem(new Configuration())
    try f(fs, p)
    finally {
      def rm(x: java.io.File): Unit = { if (x.isDirectory) x.listFiles().foreach(rm); x.delete(); () }
      rm(dir)
    }
  }

  test("round-trip: persist then load returns the same map") {
    withFs { (fs, p) =>
      val entries = Map("file:/a/leaf1" -> 1700000000000L, "file:/a/leaf2" -> 0L)
      CompactionStream.persistSchedule(fs, p, entries)
      CompactionStream.loadSchedule(fs, p) shouldBe entries
    }
  }

  test("missing file loads as empty") {
    withFs { (fs, p) => CompactionStream.loadSchedule(fs, p) shouldBe Map.empty }
  }

  test("a line without a tab is skipped; the rest of the snapshot survives") {
    withFs { (fs, p) =>
      val out = fs.create(p, true)
      out.write("123\tfile:/a/leaf1\nnot-a-schedule-line\n456\tfile:/a/leaf2\n".getBytes("UTF-8"))
      out.close()
      CompactionStream.loadSchedule(fs, p) shouldBe
        Map("file:/a/leaf1" -> 123L, "file:/a/leaf2" -> 456L)
    }
  }

  test("an unparseable due-ms drops the snapshot (logged), not the stream") {
    withFs { (fs, p) =>
      val out = fs.create(p, true)
      out.write("123\tfile:/a/leaf1\nnot-a-number\tfile:/a/leaf2\n".getBytes("UTF-8"))
      out.close()
      CompactionStream.loadSchedule(fs, p) shouldBe Map.empty
    }
  }

  test("persist overwrites a previous snapshot") {
    withFs { (fs, p) =>
      CompactionStream.persistSchedule(fs, p, Map("file:/a/leaf1" -> 1L))
      CompactionStream.persistSchedule(fs, p, Map("file:/a/leaf2" -> 2L))
      CompactionStream.loadSchedule(fs, p) shouldBe Map("file:/a/leaf2" -> 2L)
    }
  }

  test("persist and load never throw on a failing FileSystem") {
    val broken = new RawLocalFileSystem() {
      initialize(java.net.URI.create("file:///"), new Configuration())
      override def create(p: Path, overwrite: Boolean): org.apache.hadoop.fs.FSDataOutputStream =
        throw new java.io.IOException("injected create failure")
      override def open(p: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream =
        throw new java.io.IOException("injected open failure")
      override def exists(p: Path): Boolean = true
    }
    val p = new Path("/tmp/graft-sched-never-written")
    noException should be thrownBy CompactionStream.persistSchedule(broken, p, Map("x" -> 1L))
    CompactionStream.loadSchedule(broken, p) shouldBe Map.empty
  }
}
