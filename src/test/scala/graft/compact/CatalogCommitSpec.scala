package graft.compact

import java.io.File
import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** A local-fs scheme whose `open` can be made to FAIL for chosen file
  * names — the transient object-store read error (throttle, 500) the
  * expire GC's reference scan must treat as UNKNOWN, never as
  * "unreferenced". Statuses are eagerized like SecondFsSpec's scheme
  * (RawLocalFileSystem loads permissions lazily via java.io.File,
  * which rejects non-`file` schemes).
  */
class FlakyCatFs extends RawLocalFileSystem {
  override def getScheme: String = "flakycat"
  override def getUri: URI = URI.create("flakycat:///")
  private def eager(st: FileStatus): FileStatus = new FileStatus(
    st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
    st.getModificationTime, st.getAccessTime,
    if (st.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
    "graft", "graft", st.getPath,
  )
  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(eager)
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    if (FlakyCatFs.denyOpen.exists(f.getName.contains))
      throw new java.io.IOException(s"injected read failure: $f")
    super.open(f, bufferSize)
  }
}
object FlakyCatFs {
  @volatile var denyOpen: Set[String] = Set.empty
}

/** `CatalogCommit` — the multi-leaf atomic publish: catalog readers see
  * old-EVERYTHING or new-EVERYTHING across member leaves, never a mix,
  * through every crash window of the snapshot protocol.
  */
class CatalogCommitSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-catalog").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  /** A WAP-shaped append: outputs land HIDDEN under `.data-<runId>/`
    * so the manifest log versions them (a bare-named raw arrival is
    * visible to every as-of read by design — the documented leaf
    * caveat — and a catalog pin could not isolate it).
    */
  private def appendCommit(leaf: String, name: String, runId: String, ids: Seq[Long]): Long = {
    val s = spark
    import s.implicits._
    new File(leaf).mkdirs()
    val dataDir = s"$leaf/.data-$runId"
    ids.toDF("id").coalesce(1).write.parquet(dataDir)
    val fs = FileIndexer.fsFor(spark, leaf)
    val outs = fs.listStatus(new org.apache.hadoop.fs.Path(dataDir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => s".data-$runId/${f.getPath.getName}").sorted.toSeq
    ManifestCommit.publish(fs, leaf, "app", runId, Seq.empty, outs, rows = ids.size.toLong)
    ManifestCommit.currentSeq(spark, leaf)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def snapName(seq: Long) = f"_cat-$seq%09d.json"

  test("crash matrix: readers land on old-everything or new-everything, never a mix; torn snapshots and lost publishes are invisible") {
    val cat = new File(root, "cat1").getAbsolutePath
    val seqA1 = appendCommit(s"$cat/leafA", "a1.parquet", "ra1", 1L to 10L)
    val seqB1 = appendCommit(s"$cat/leafB", "b1.parquet", "rb1", 100L to 110L)
    val s1 = CatalogCommit.publish(spark, cat, Map("leafA" -> seqA1, "leafB" -> seqB1))
    s1.seq shouldBe 1L
    ids(CatalogCommit.readLeaf(spark, cat, "leafA")) shouldBe (1L to 10L)
    ids(CatalogCommit.readLeaf(spark, cat, "leafB")) shouldBe (100L to 110L)

    // CRASH WINDOW 1: both leaves take new commits, the catalog publish
    // never runs — catalog readers stay pinned at OLD-everything even
    // though direct leaf readers already see the future
    val seqA2 = appendCommit(s"$cat/leafA", "a2.parquet", "ra2", 11L to 20L)
    val seqB2 = appendCommit(s"$cat/leafB", "b2.parquet", "rb2", 111L to 120L)
    ids(ManifestCommit.readLeaf(spark, s"$cat/leafA")) shouldBe (1L to 20L) // leaf-level future
    ids(CatalogCommit.readLeaf(spark, cat, "leafA")) shouldBe (1L to 10L) // catalog still pinned
    ids(CatalogCommit.readLeaf(spark, cat, "leafB")) shouldBe (100L to 110L)

    // CRASH WINDOW 2: a torn snapshot upload (no seal mark) is ignored
    val torn = new File(cat, "_cat-000000002.json")
    Files.write(torn.toPath, """{"seq":2,"leaves":[{"p":"leafA","s":99}]""".getBytes)
    CatalogCommit.current(spark, cat).get.seq shouldBe 1L
    ids(CatalogCommit.readLeaf(spark, cat, "leafA")) shouldBe (1L to 10L)
    torn.delete() shouldBe true

    // the healing publish: ONE put flips BOTH leaves together
    val s2 = CatalogCommit.publish(spark, cat, Map("leafA" -> seqA2, "leafB" -> seqB2))
    s2.seq shouldBe 2L
    ids(CatalogCommit.readLeaf(spark, cat, "leafA")) shouldBe (1L to 20L)
    ids(CatalogCommit.readLeaf(spark, cat, "leafB")) shouldBe (100L to 120L)

    // time travel: the old snapshot still reads old-everything
    val snap1 = CatalogCommit.snapshotAt(spark, cat, 1L).get
    ids(CatalogCommit.readLeafAt(spark, cat, "leafA", snap1)) shouldBe (1L to 10L)
    ids(CatalogCommit.readLeafAt(spark, cat, "leafB", snap1)) shouldBe (100L to 110L)
  }

  test("partial-update publish carries the untouched member's pin forward; non-members read loudly") {
    val cat = new File(root, "cat2").getAbsolutePath
    val seqA = appendCommit(s"$cat/leafA", "a.parquet", "ca1", 1L to 5L)
    val seqB = appendCommit(s"$cat/leafB", "b.parquet", "cb1", 6L to 9L)
    CatalogCommit.publish(spark, cat, Map("leafA" -> seqA, "leafB" -> seqB))

    val seqA2 = appendCommit(s"$cat/leafA", "a2.parquet", "ca2", 50L to 55L)
    val s2 = CatalogCommit.publish(spark, cat, Map("leafA" -> seqA2)) // B carried forward
    s2.leaves("leafB") shouldBe seqB
    ids(CatalogCommit.readLeaf(spark, cat, "leafA")) shouldBe ((1L to 5L) ++ (50L to 55L))
    ids(CatalogCommit.readLeaf(spark, cat, "leafB")) shouldBe (6L to 9L)

    val ex = intercept[IllegalArgumentException] {
      CatalogCommit.readLeaf(spark, cat, "leafZ")
    }
    ex.getMessage should include("not a member")
  }

  test("torn snapshot debris never wedges the catalog: its seq is burned and publish lands past it") {
    val cat = new File(root, "cat3").getAbsolutePath
    val seqA = appendCommit(s"$cat/leafA", "a.parquet", "xa1", 1L to 3L)
    CatalogCommit.publish(spark, cat, Map("leafA" -> seqA))

    // a writer died mid-upload at seq 2 (create landed, never sealed):
    // readers ignore it, and the next publish BURNS the seq instead of
    // colliding with the debris forever — the wedge the first cut had.
    // (A SEALED file at the same name is a live racer and still aborts
    // the loser loudly — that branch only opens in a true TOCTOU race.)
    Files.write(new File(cat, "_cat-000000002.json").toPath, """{"seq":2,""".getBytes)
    val winner = CatalogCommit.publish(spark, cat, Map("leafA" -> seqA))
    winner.seq shouldBe 3L
    CatalogCommit.current(spark, cat).get.seq shouldBe 3L
    ids(CatalogCommit.readLeaf(spark, cat, "leafA")) shouldBe (1L to 3L)
    new File(cat, "_cat-000000002.json").delete() shouldBe true

    // retention surfaces: oldestPin tracks the expire horizon; expire
    // retires old snapshots and the pinned floor moves up
    CatalogCommit.oldestPin(spark, cat, "leafA") shouldBe Some(seqA)
    CatalogCommit.expire(spark, cat, keepFrom = 2L) shouldBe 1
    CatalogCommit.current(spark, cat).get.seq shouldBe 3L
    CatalogCommit.snapshotAt(spark, cat, 1L) shouldBe None
  }

  private def sealedJson(seq: Long, pins: (String, Long)*): Array[Byte] = {
    val body = pins.sortBy(_._1).map { case (p, s) => s"""{"p":"$p","s":$s}""" }.mkString("[", ",", "]")
    s"""{"seq":$seq,"leaves":$body,"sealed":true}""".getBytes
  }

  test("a live racer that seals its colliding snapshot DURING the debris wait aborts this publish — its pins are never dropped") {
    val cat = new File(root, "cat4").getAbsolutePath
    val seqA = appendCommit(s"$cat/leafA", "a.parquet", "ya1", 1L to 4L)
    val seqB = appendCommit(s"$cat/leafB", "b.parquet", "yb1", 10L to 14L)
    CatalogCommit.publish(spark, cat, Map("leafA" -> seqA, "leafB" -> seqB))

    // the racer's snapshot at seq 2 is mid-upload (unsealed) when our
    // publish collides with it; it seals 300 ms in — inside the wait
    val racerFile = new File(cat, "_cat-000000002.json")
    Files.write(racerFile.toPath, """{"seq":2,""".getBytes)
    val sealer = new Thread(() => {
      Thread.sleep(300)
      Files.write(racerFile.toPath, sealedJson(2L, "leafA" -> seqA, "leafB" -> (seqB + 7)))
      ()
    })
    sealer.start()
    val ex = intercept[ConcurrentCommitException] {
      CatalogCommit.publish(spark, cat, Map("leafA" -> (seqA + 1)), debrisWaitMs = 5000L)
    }
    sealer.join()
    withClue(ex.getMessage) { ex.getMessage should include(cat) }
    // the racer's snapshot IS the current state, pins intact — the
    // aborted loser re-resolves and re-publishes over it
    val cur = CatalogCommit.current(spark, cat).get
    cur.seq shouldBe 2L
    cur.leaves("leafB") shouldBe (seqB + 7)
  }

  test("a racer that seals AFTER the skip-ahead is caught by the post-seal audit: the publish retracts itself and throws") {
    val cat = new File(root, "cat5").getAbsolutePath
    val seqA = appendCommit(s"$cat/leafA", "a.parquet", "za1", 1L to 4L)
    CatalogCommit.publish(spark, cat, Map("leafA" -> seqA))

    // unsealed collider at seq 2; the racer is slower than any bounded
    // wait — it seals only after our publish has burned the seq and
    // moved on (scheduled deterministically through the burn hook)
    val racerFile = new File(cat, "_cat-000000002.json")
    Files.write(racerFile.toPath, """{"seq":2,""".getBytes)
    val ex = intercept[ConcurrentCommitException] {
      CatalogCommit.publishImpl(
        spark, cat, Map("leafA" -> (seqA + 1)), debrisWaitMs = 0L,
        onSeqBurned = { s0 =>
          if (s0 == 2L) { Files.write(racerFile.toPath, sealedJson(2L, "leafA" -> (seqA + 9))); () }
        },
      )
    }
    withClue(ex.getMessage) { ex.getMessage should include(cat) }
    // the loser's own seq-3 snapshot was retracted: the racer's chain
    // is the surviving state (silently-lost pins were the old failure)
    val cur = CatalogCommit.current(spark, cat).get
    cur.seq shouldBe 2L
    cur.leaves("leafA") shouldBe (seqA + 9)
    new File(cat, "_cat-000000003.json").exists() shouldBe false
  }

  test("the LOSER side of the burn race: a slow writer whose in-flight seq a faster publisher burned retracts itself and throws, never returns success") {
    val cat = new File(root, "cat6").getAbsolutePath
    val seqA = appendCommit(s"$cat/leafA", "a.parquet", "wa1", 1L to 4L)
    val seqB = appendCommit(s"$cat/leafB", "b.parquet", "wb1", 10L to 14L)
    CatalogCommit.publish(spark, cat, Map("leafA" -> seqA, "leafB" -> seqB))

    // WE are the slow writer: between our create of _cat-2 and our
    // body write, a fast publisher collides, classifies us as debris
    // (debrisWaitMs=0), burns seq 2 and seals seq 3 pinning leafB —
    // carrying leafA at the OLD pin. Our seal lands last; without the
    // loser-side audit we would return success while the current chain
    // has dropped our leafA update forever.
    val ex = intercept[ConcurrentCommitException] {
      CatalogCommit.publishImpl(
        spark, cat, Map("leafA" -> (seqA + 1)), debrisWaitMs = 0L,
        onSeqBurned = _ => (),
        onCreated = { s0 =>
          if (s0 == 2L) { CatalogCommit.publish(spark, cat, Map("leafB" -> (seqB + 5)), debrisWaitMs = 0L); () }
        },
      )
    }
    withClue(ex.getMessage) { ex.getMessage should include(cat) }
    // the fast publisher's chain stands; our sealed-last seq-2 file was
    // retracted (it sat in the winner's burned gap claiming pins the
    // chain dropped)
    val cur = CatalogCommit.current(spark, cat).get
    cur.seq shouldBe 3L
    cur.leaves("leafA") shouldBe seqA // our update is NOT in the chain — hence the throw
    cur.leaves("leafB") shouldBe (seqB + 5)
    new File(cat, "_cat-000000002.json").exists() shouldBe false
  }

  private def grpFiles(cat: String): Seq[String] =
    new File(cat).listFiles().map(_.getName).filter(_.startsWith("_grp-")).sorted.toSeq

  test("groupOf is a FROZEN function: concrete gid values pinned, because a drifted hash would silently orphan every pin in existing grouped catalogs") {
    // these constants are the on-disk format: a leaf's pins live in the
    // group manifest its hash selected at publish time, and every later
    // read recomputes the gid to find them. If a Scala upgrade (or a
    // refactor) changes MurmurHash3.stringHash, this spec fails BEFORE
    // a deployment quietly starts reading the wrong group and reporting
    // members as missing. On failure: do NOT update the constants —
    // restore the old hash (or version the root's hash id).
    CatalogCommit.groupOf("leafA", 8) shouldBe 4
    CatalogCommit.groupOf("leafB", 8) shouldBe 1
    CatalogCommit.groupOf("leafC", 8) shouldBe 5
    CatalogCommit.groupOf("acct0001/source=s1/year=2026/month=01", 317) shouldBe 281
    CatalogCommit.groupOf("", 4) shouldBe Math.floorMod(scala.util.hashing.MurmurHash3.stringHash(""), 4)
    // total function over any gcount: in-range and deterministic
    (1 to 64).foreach { g =>
      val v = CatalogCommit.groupOf("some/leaf", g)
      v should (be >= 0 and be < g)
      CatalogCommit.groupOf("some/leaf", g) shouldBe v
    }
  }

  test("two-level layout: a grouped publish rewrites ONLY the touched groups, carries the rest by reference, and the pinned read still isolates the lagging commit") {
    val cat = new File(root, "cat7").getAbsolutePath
    val seqA = appendCommit(s"$cat/leafA", "a.parquet", "ga1", 1L to 10L)
    val seqB = appendCommit(s"$cat/leafB", "b.parquet", "gb1", 100L to 110L)
    // leafA and leafB must land in DIFFERENT groups for the touched-
    // group assertion to bite; with 8 groups the stable hash separates
    // them (asserted, not assumed)
    val g = 8
    CatalogCommit.groupOf("leafA", g) should not be CatalogCommit.groupOf("leafB", g)
    val s1 = CatalogCommit.publish(spark, cat, Map("leafA" -> seqA, "leafB" -> seqB), groups = Some(g))
    s1.seq shouldBe 1L
    s1.leaves shouldBe Map("leafA" -> seqA, "leafB" -> seqB)
    val files1 = grpFiles(cat)
    files1.size shouldBe 2 // one manifest per non-empty group

    // touch ONLY leafA: the next publish (format carried — no explicit
    // groups) writes exactly ONE new group manifest and references
    // leafB's group file untouched, byte-identical by name
    val seqA2 = appendCommit(s"$cat/leafA", "a2.parquet", "ga2", 11L to 20L)
    val s2 = CatalogCommit.publish(spark, cat, Map("leafA" -> seqA2))
    s2.seq shouldBe 2L
    val files2 = grpFiles(cat)
    files2.size shouldBe 3
    (files2.toSet -- files1.toSet).size shouldBe 1 // one new group file
    files1.forall(files2.contains) shouldBe true // B's ref carried, file untouched
    s2.leaves shouldBe Map("leafA" -> seqA2, "leafB" -> seqB)

    // catalog readers stay pinned across an unpublished leaf commit —
    // the same isolation contract as the inline form
    val seqB2 = appendCommit(s"$cat/leafB", "b2.parquet", "gb2", 111L to 120L)
    seqB2 should be > seqB
    ids(CatalogCommit.readLeaf(spark, cat, "leafB")) shouldBe (100L to 110L)
    ids(CatalogCommit.readLeaf(spark, cat, "leafA")) shouldBe (1L to 20L)
    // time travel through the grouped root resolves the old view
    val snap1 = CatalogCommit.snapshotAt(spark, cat, 1L).get
    ids(CatalogCommit.readLeafAt(spark, cat, "leafA", snap1)) shouldBe (1L to 10L)
    // non-members stay loud
    intercept[IllegalArgumentException] {
      CatalogCommit.readLeaf(spark, cat, "leafZ")
    }.getMessage should include("not a member")
  }

  test("inline→grouped migration re-splits the carried map once; expire GCs exactly the group manifests no retained root references") {
    val cat = new File(root, "cat8").getAbsolutePath
    val seqA = appendCommit(s"$cat/leafA", "a.parquet", "ha1", 1L to 5L)
    val seqB = appendCommit(s"$cat/leafB", "b.parquet", "hb1", 10L to 15L)
    // two INLINE publishes first
    CatalogCommit.publish(spark, cat, Map("leafA" -> seqA, "leafB" -> seqB))
    val seqA2 = appendCommit(s"$cat/leafA", "a2.parquet", "ha2", 6L to 9L)
    CatalogCommit.publish(spark, cat, Map("leafA" -> seqA2))
    grpFiles(cat) shouldBe Seq.empty
    // the migration publish splits the full carried map into groups
    val seqB2 = appendCommit(s"$cat/leafB", "b2.parquet", "hb2", 16L to 19L)
    val s3 = CatalogCommit.publish(spark, cat, Map("leafB" -> seqB2), groups = Some(4))
    s3.leaves shouldBe Map("leafA" -> seqA2, "leafB" -> seqB2)
    val migrated = grpFiles(cat)
    migrated.nonEmpty shouldBe true
    // a steady-state grouped publish after migration
    val seqA3 = appendCommit(s"$cat/leafA", "a3.parquet", "ha3", 20L to 24L)
    CatalogCommit.publish(spark, cat, Map("leafA" -> seqA3))
    // memoized sweep horizon == per-leaf horizon, across BOTH formats
    // in the retained set (2 inline + 2 grouped roots)
    val pins = CatalogCommit.oldestPins(spark, cat)
    pins.keySet shouldBe Set("leafA", "leafB")
    pins("leafA") shouldBe CatalogCommit.oldestPin(spark, cat, "leafA").get
    pins("leafB") shouldBe CatalogCommit.oldestPin(spark, cat, "leafB").get
    pins("leafA") shouldBe seqA // the first inline root still pins the original head

    // expire below the newest root: older roots AND the group manifests
    // only they referenced are GC'd; the retained root keeps resolving
    val head = CatalogCommit.current(spark, cat).get
    CatalogCommit.expire(spark, cat, keepFrom = head.seq) shouldBe 3
    val kept = grpFiles(cat)
    kept.size should be < migrated.size + 2 // the superseded group file is gone
    val resolved = CatalogCommit.current(spark, cat).get
    resolved.seq shouldBe head.seq
    resolved.leaves shouldBe Map("leafA" -> seqA3, "leafB" -> seqB2)
    // and the retained root's every referenced group survived the GC
    ids(CatalogCommit.readLeaf(spark, cat, "leafA")) shouldBe ((1L to 9L) ++ (20L to 24L))
    // the floor moved with the snapshots
    CatalogCommit.oldestPins(spark, cat) shouldBe Map("leafA" -> seqA3, "leafB" -> seqB2)
  }

  test("guard 3: a publish whose referenced group manifest is GC'd before its root seals retracts itself and throws — never a sealed root that cannot resolve") {
    val cat = new File(root, "cat9").getAbsolutePath
    val seqA = appendCommit(s"$cat/leafA", "a.parquet", "ia1", 1L to 4L)
    val seqB = appendCommit(s"$cat/leafB", "b.parquet", "ib1", 10L to 14L)
    CatalogCommit.publish(spark, cat, Map("leafA" -> seqA, "leafB" -> seqB), groups = Some(8))
    val before = grpFiles(cat).toSet
    // simulate the racing-expire window: between our root CREATE and the
    // post-seal audit, the group manifest this publish just wrote (and
    // the root now references) disappears
    val seqA2 = appendCommit(s"$cat/leafA", "a2.parquet", "ia2", 5L to 8L)
    val ex = intercept[ConcurrentCommitException] {
      CatalogCommit.publishImpl(
        spark, cat, Map("leafA" -> seqA2), debrisWaitMs = 0L,
        onSeqBurned = _ => (),
        onCreated = { _ =>
          grpFiles(cat).filterNot(before.contains)
            .foreach(f => new File(cat, f).delete() shouldBe true)
        },
      )
    }
    withClue(ex.getMessage) { ex.getMessage should include(cat) }
    // the doomed root was retracted; the previous snapshot is current
    // and fully resolvable
    val cur = CatalogCommit.current(spark, cat).get
    cur.seq shouldBe 1L
    cur.leaves shouldBe Map("leafA" -> seqA, "leafB" -> seqB)
    new File(cat, "_cat-000000002.json").exists() shouldBe false
  }

  test("LIVE grouped-publisher race: four threads publish disjoint leaves concurrently — every ACKNOWLEDGED update survives in the resolved chain and every retained root resolves") {
    val cat = new File(root, "cat-race").getAbsolutePath
    val threads = 4
    val rounds = 6
    // seed so every thread starts from a grouped root
    CatalogCommit.publish(
      spark, cat, (0 until threads).map(i => s"t$i" -> 0L).toMap, groups = Some(4))
    val acked = Array.fill(threads)(0L)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = (0 until threads).map { i =>
      new Thread(() => {
        try {
          (1 to rounds).foreach { k =>
            // a non-acknowledged publish surfaces as EITHER
            // ConcurrentCommitException (lost the race) or IOException
            // (could not CERTIFY the race — e.g. the local checksum fs
            // throws on a file mid-write, which guard 1 rightly refuses
            // to classify as torn) — both leave the chain without our
            // pins and both are the protocol's retry signal; silent
            // loss is the only outcome that may never happen. Retry
            // until acknowledged, bounded.
            var attempts = 0
            var done = false
            while (!done) {
              try {
                CatalogCommit.publish(spark, cat, Map(s"t$i" -> k.toLong), debrisWaitMs = 50L)
                acked(i) = k.toLong
                done = true
              } catch {
                case e @ (_: ConcurrentCommitException | _: java.io.IOException) =>
                  attempts += 1
                  if (attempts > 200) throw new IllegalStateException(
                    s"thread $i livelocked at k=$k after $attempts retries (last: $e)")
                  Thread.sleep(1L + scala.util.Random.nextInt(5))
              }
            }
          }
        } catch { case t: Throwable => failures.add(t); () }
      })
    }
    pool.foreach(_.start())
    pool.foreach(_.join(120000))
    failures.forEach(t => fail(s"racing publisher died: $t", t))
    val cur = CatalogCommit.current(spark, cat).get
    // no acknowledged update was ever lost (a carried-forward pin from
    // a retracted racer may legally exceed the acknowledged value —
    // the documented spurious-visible window — but never undercut it)
    (0 until threads).foreach { i =>
      withClue(s"t$i: ") { cur.leaves(s"t$i") should be >= acked(i) }
    }
    // the whole retained chain resolves: no sealed root was left
    // referencing a GC'd or never-written group manifest
    val fs0 = new org.apache.hadoop.fs.Path(cat)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs0.listStatus(new org.apache.hadoop.fs.Path(cat))
      .flatMap(e => CatalogCommit.seqOf(e.getPath.getName))
      .foreach { s0 =>
        CatalogCommit.snapshotAt(spark, cat, s0).foreach { snap =>
          snap.leaves.keySet shouldBe (0 until threads).map(i => s"t$i").toSet
        }
      }
  }

  test("an unreadable RETAINED root poisons expire's group GC (skipped, retried next pass) — a transient read error never deletes manifests a sealed root still references") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flakycat.impl", classOf[FlakyCatFs].getName)
    val dir = new File(root, "cat-flaky"); dir.mkdirs()
    val cat = s"flakycat:${dir.getAbsolutePath}"
    // two grouped publishes: root 2 rewrites leafA's group and carries
    // leafB's by reference — after expire(keepFrom=2), root 1 and the
    // superseded leafA group are the ONLY legitimate GC targets
    CatalogCommit.publish(spark, cat, Map("leafA" -> 1L, "leafB" -> 1L), groups = Some(8))
    CatalogCommit.publish(spark, cat, Map("leafA" -> 2L))
    def grp() = dir.listFiles().map(_.getName).filter(_.startsWith("_grp-")).sorted.toSeq
    val before = grp()
    before.size shouldBe 3

    // the retained root (seq 2) is unreadable during this expire: the
    // scan is UNKNOWN, so NO group manifest may be GC'd — deleting the
    // "unreferenced-looking" ones would permanently break root 2,
    // which still resolves through them. Root expiry itself is
    // name-based and proceeds.
    FlakyCatFs.denyOpen = Set("_cat-000000002.json")
    try CatalogCommit.expire(spark, cat, keepFrom = 2L) shouldBe 1
    finally FlakyCatFs.denyOpen = Set.empty
    grp() shouldBe before // every group survived the poisoned scan
    val cur2 = CatalogCommit.current(spark, cat).get
    cur2.seq shouldBe 2L
    cur2.leaves shouldBe Map("leafA" -> 2L, "leafB" -> 1L) // fully resolvable

    // with the read healed, the next expire GCs exactly the superseded
    // group and the retained root keeps resolving
    CatalogCommit.expire(spark, cat, keepFrom = 2L) shouldBe 0
    grp().size shouldBe 2
    CatalogCommit.current(spark, cat).get.leaves shouldBe Map("leafA" -> 2L, "leafB" -> 1L)
  }

  test("grouped time travel is LAZY: a single-leaf readLeafAt parses root + ONE group — proven by deleting every other group manifest first") {
    val cat = new File(root, "cat-lazy-tt").getAbsolutePath
    val g = 8
    // leafA..leafC land in three DIFFERENT groups (asserted via the
    // frozen hash), so "only leafA's group is parsed" is observable
    Seq(("leafA", "leafB"), ("leafA", "leafC"), ("leafB", "leafC")).foreach { case (x, y) =>
      CatalogCommit.groupOf(x, g) should not be CatalogCommit.groupOf(y, g)
    }
    val seqA = appendCommit(s"$cat/leafA", "a.parquet", "la1", 1L to 5L)
    val seqB = appendCommit(s"$cat/leafB", "b.parquet", "lb1", 10L to 14L)
    val seqC = appendCommit(s"$cat/leafC", "c.parquet", "lc1", 20L to 24L)
    CatalogCommit.publish(
      spark, cat, Map("leafA" -> seqA, "leafB" -> seqB, "leafC" -> seqC), groups = Some(g))
    val seqA2 = appendCommit(s"$cat/leafA", "a2.parquet", "la2", 6L to 9L)
    CatalogCommit.publish(spark, cat, Map("leafA" -> seqA2))

    // externally damage the catalog: every group manifest EXCEPT
    // leafA's seq-1 group is gone. An eager snapshotAt (the r18 form)
    // would throw right here; the lazy pin path never touches them.
    val gidA = CatalogCommit.groupOf("leafA", g)
    val keep = f"_grp-${1L}%09d-$gidA%04d-"
    grpFiles(cat).filterNot(_.startsWith(keep))
      .foreach(f => new File(cat, f).delete() shouldBe true)

    val snap1 = CatalogCommit.snapshotAt(spark, cat, 1L).get
    snap1.pin("leafA") shouldBe Some(seqA)
    ids(CatalogCommit.readLeafAt(spark, cat, "leafA", snap1)) shouldBe (1L to 5L)
    // forcing the FULL map still fails loudly on the damaged groups —
    // laziness narrows what a single-leaf read pays, not what a full
    // resolution still requires
    intercept[IllegalStateException] { snap1.leaves }
  }

  test("a root delete failure during expire keeps that root's group manifests out of the GC — a sealed survivor must stay resolvable, not throw") {
    val cat = new File(root, "cat-delfail").getAbsolutePath
    val seqA = appendCommit(s"$cat/leafA", "a.parquet", "da1", 1L to 3L)
    val seqB = appendCommit(s"$cat/leafB", "b.parquet", "db1", 10L to 12L)
    CatalogCommit.publish(spark, cat, Map("leafA" -> seqA, "leafB" -> seqB), groups = Some(8))
    val seqA2 = appendCommit(s"$cat/leafA", "a2.parquet", "da2", 4L to 6L)
    CatalogCommit.publish(spark, cat, Map("leafA" -> seqA2))
    val before = grpFiles(cat)
    before.size shouldBe 3 // A@1, B@1 (carried into root 2), A@2

    // root 1's delete FAILS (an object-store hiccup): it remains a
    // sealed, resolvable snapshot, so the superseded leafA group it
    // references must survive this GC pass — without the protection,
    // snapshotAt(1).leaves would throw IllegalStateException instead
    // of resolving (advice r18)
    val fs = FileIndexer.fsFor(spark, cat)
    val removed = CatalogCommit.expireImpl(
      fs, cat, keepFrom = 2L,
      deleteRoot = p => if (p.getName == "_cat-000000001.json") false else fs.delete(p, false))
    removed shouldBe 0
    grpFiles(cat) shouldBe before // every group protected
    val snap1 = CatalogCommit.snapshotAt(spark, cat, 1L).get
    snap1.leaves shouldBe Map("leafA" -> seqA, "leafB" -> seqB)

    // the hiccup clears: the retried expire removes the root AND GCs
    // exactly the group only it referenced
    CatalogCommit.expire(spark, cat, keepFrom = 2L) shouldBe 1
    grpFiles(cat).size shouldBe 2
    CatalogCommit.current(spark, cat).get.leaves shouldBe Map("leafA" -> seqA2, "leafB" -> seqB)
  }

  test("one Snapshot is safe under concurrent readers: parallel pin() calls race each other and the lazy full-map force on the shared memo cache") {
    val cat = new File(root, "cat-conc").getAbsolutePath
    val members = (0 until 32).map(i => f"cleaf-$i%02d")
    CatalogCommit.publish(spark, cat, members.map(_ -> 1L).toMap, groups = Some(8))
    CatalogCommit.publish(spark, cat, Map(members.head -> 2L))
    val snap = CatalogCommit.current(spark, cat).get
    val expected = (members.map(_ -> 1L).toMap + (members.head -> 2L))
    // 8 pin threads + 1 leaves-forcing thread over the SAME snapshot:
    // the memo cache behind both faces must tolerate the race (a plain
    // HashMap under getOrElseUpdate corrupts — lost entries, wrong
    // lookups, or a hung resize; review r19)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        (1 to 20).foreach { _ =>
          members.foreach { m =>
            val p = snap.pin(m)
            if (!p.contains(expected(m))) failures.add(s"t$t: $m pinned $p, expected ${expected(m)}")
          }
        }
      })
    } :+ new Thread(() => {
      if (snap.leaves != expected) failures.add(s"leaves force diverged: ${snap.leaves.size}")
    })
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    failures.toArray shouldBe empty
  }

  test("a root GONE by the time expire re-reads it (delete returned false because a racer removed it) contributes no references and does NOT poison the group GC") {
    val cat = new File(root, "cat-gone").getAbsolutePath
    val seqA = appendCommit(s"$cat/leafA", "a.parquet", "go1", 1L to 3L)
    CatalogCommit.publish(spark, cat, Map("leafA" -> seqA), groups = Some(4))
    val seqA2 = appendCommit(s"$cat/leafA", "a2.parquet", "go2", 4L to 6L)
    CatalogCommit.publish(spark, cat, Map("leafA" -> seqA2))
    grpFiles(cat).size shouldBe 2
    // the seam mimics a concurrent expire winning the delete race:
    // our delete "fails" (returns false) but the file is already gone
    // — the survivor-protection re-read must treat FileNotFound as
    // "references nothing", not as an unreadable snapshot that skips
    // the whole GC pass (review r19: two drivers running expire would
    // otherwise permanently skip each other's group GC)
    val fs = FileIndexer.fsFor(spark, cat)
    val removed = CatalogCommit.expireImpl(
      fs, cat, keepFrom = 2L,
      deleteRoot = p => { fs.delete(p, false); false })
    removed shouldBe 0 // we did not win the delete
    grpFiles(cat).size shouldBe 1 // GC still ran: the superseded group went
    CatalogCommit.current(spark, cat).get.leaves shouldBe Map("leafA" -> seqA2)
  }

  test("guard 1 never burns an UNREADABLE colliding snapshot: the publish fails as IO with the seq intact, and succeeds once the read heals") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flakycat.impl", classOf[FlakyCatFs].getName)
    val dir = new File(root, "cat-unreadable-collision"); dir.mkdirs()
    val cat = s"flakycat:${dir.getAbsolutePath}"
    CatalogCommit.publish(spark, cat, Map("leafA" -> 1L))
    // an in-flight writer's file sits at seq 2 (created, unsealed) and
    // READS of it fail transiently — it may be a sealed racer the
    // failure is hiding, so the publish must NOT classify it as dead
    // debris and burn the seq (that was the r19 review's silent-loss
    // schedule); it fails loudly as IO instead
    Files.write(new File(dir, snapName(2L)).toPath, """{"seq":2,""".getBytes)
    FlakyCatFs.denyOpen = Set(snapName(2L))
    try {
      val ex = intercept[java.io.IOException] {
        CatalogCommit.publish(spark, cat, Map("leafA" -> 2L), debrisWaitMs = 50L)
      }
      ex.getMessage should include("UNREADABLE")
      // nothing was burned or sealed past the debris
      CatalogCommit.current(spark, cat).get.seq shouldBe 1L
      new File(dir, snapName(3L)).exists() shouldBe false
    } finally FlakyCatFs.denyOpen = Set.empty
    // healed: the same publish classifies the debris as TORN, burns the
    // seq, and lands at 3 — the normal debris path
    val snap = CatalogCommit.publish(spark, cat, Map("leafA" -> 2L), debrisWaitMs = 0L)
    snap.seq shouldBe 3L
    snap.leaves shouldBe Map("leafA" -> 2L)
  }

  test("a transient group-read failure is NOT negative-cached: pin() throws while the read fails and succeeds on the same Snapshot after it heals") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flakycat.impl", classOf[FlakyCatFs].getName)
    val dir = new File(root, "cat-pin-heal"); dir.mkdirs()
    val cat = s"flakycat:${dir.getAbsolutePath}"
    CatalogCommit.publish(spark, cat, Map("leafA" -> 1L, "leafB" -> 1L), groups = Some(8))
    val snap = CatalogCommit.current(spark, cat).get
    val grpOfA = dir.listFiles().map(_.getName)
      .filter(_.startsWith(f"_grp-${1L}%09d-${CatalogCommit.groupOf("leafA", 8)}%04d-"))
    grpOfA.length shouldBe 1
    FlakyCatFs.denyOpen = grpOfA.toSet
    try intercept[Exception] { snap.pin("leafA") }
    finally FlakyCatFs.denyOpen = Set.empty
    // the failure must not have been memoized as "missing": the SAME
    // snapshot resolves once storage heals (review r19 — the old
    // negative cache threw IllegalStateException forever)
    snap.pin("leafA") shouldBe Some(1L)
    snap.leaves shouldBe Map("leafA" -> 1L, "leafB" -> 1L)
  }

  test("floors are strict: oldestPin/oldestPins THROW on an unreadable retained snapshot instead of silently dropping its pins from the horizon") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flakycat.impl", classOf[FlakyCatFs].getName)
    val dir = new File(root, "cat-strict-floors"); dir.mkdirs()
    val cat = s"flakycat:${dir.getAbsolutePath}"
    CatalogCommit.publish(spark, cat, Map("leafA" -> 1L))
    CatalogCommit.publish(spark, cat, Map("leafA" -> 5L))
    // snapshot 1 pins leafA at 1; hiding it must not yield floors {5}
    // (expiry clamped to 5 would GC the history snapshot 1 still reads)
    FlakyCatFs.denyOpen = Set(snapName(1L))
    try {
      intercept[java.io.IOException] { CatalogCommit.oldestPins(spark, cat) }
      intercept[java.io.IOException] { CatalogCommit.oldestPin(spark, cat, "leafA") }
      // time travel is strict the same way: an unreadable snapshot
      // file throws rather than answering "expired" (None)
      intercept[java.io.IOException] { CatalogCommit.snapshotAt(spark, cat, 1L) }
    } finally FlakyCatFs.denyOpen = Set.empty
    CatalogCommit.oldestPins(spark, cat) shouldBe Map("leafA" -> 1L)
    CatalogCommit.oldestPin(spark, cat, "leafA") shouldBe Some(1L)
    CatalogCommit.snapshotAt(spark, cat, 1L).get.leaves shouldBe Map("leafA" -> 1L)
  }

  test("an empty leaf path is rejected at publish: the parser cannot round-trip it, so accepting it would silently lose the pin") {
    val cat = new File(root, "cat-empty").getAbsolutePath
    intercept[IllegalArgumentException] {
      CatalogCommit.publish(spark, cat, Map("" -> 1L))
    }.getMessage should include("non-empty")
  }

  test("a migration past the pool threshold (many groups) writes every manifest and resolves identically to the serial path") {
    val cat = new File(root, "cat-pool").getAbsolutePath
    val members = (0 until 40).map(i => f"leaf-$i%02d")
    members.foreach { m =>
      appendCommit(s"$cat/$m", s"$m.parquet", s"rp$m", 1L to 2L) shouldBe 1L
    }
    // inline first, then a 16-group migration: >4 new group manifests
    // go out on the bounded pool; correctness must not depend on which
    // path wrote them
    CatalogCommit.publish(spark, cat, members.map(_ -> 1L).toMap)
    val s2 = CatalogCommit.publish(spark, cat, Map(members.head -> 1L), groups = Some(16))
    val files = grpFiles(cat)
    files.size should be > 4
    // every non-empty group got exactly one manifest and the resolved
    // map is the full member set
    s2.leaves shouldBe members.map(_ -> 1L).toMap
    CatalogCommit.current(spark, cat).get.leaves shouldBe members.map(_ -> 1L).toMap
    members.foreach { m =>
      CatalogCommit.oldestPin(spark, cat, m) shouldBe Some(1L)
    }
  }

  test("boundedPar: the first task failure shuts the pool down NOW — queued tasks never start, the cause propagates unwrapped (r19 prescription: the interrupt/failure semantics spec'd directly, not only through the pooled paths)") {
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val boom = new RuntimeException("task 0 failed")
    try {
      val thrown = intercept[RuntimeException] {
        CatalogCommit.boundedPar(0 until 64, width = 2) { i =>
          started.incrementAndGet()
          if (i == 0) throw boom
          gate.await(30, java.util.concurrent.TimeUnit.SECONDS)
          ()
        }
      }
      // unwrapped: callers match on the real failure (IOException,
      // ConcurrentCommitException), never ExecutionException
      thrown should be theSameInstanceAs boom
      // shutdownNow drained the queue: at width 2 only the tasks already
      // running when task 0 failed ever started — the 60-odd queued
      // PUTs of a migration must not keep racing the caller's abort
      started.get() should be < 8
    } finally gate.countDown()
  }

  test("boundedPar: an interrupted CALLER cancels the pool, re-asserts the interrupt flag, and propagates InterruptedException") {
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val firstRunning = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    @volatile var flagReasserted: Option[Boolean] = None
    val t = new Thread(() =>
      try {
        CatalogCommit.boundedPar(0 until 64, width = 2) { _ =>
          started.incrementAndGet()
          firstRunning.countDown()
          gate.await(30, java.util.concurrent.TimeUnit.SECONDS)
          ()
        }
        ()
      } catch {
        // catching does NOT clear the flag — only a blocking call or
        // Thread.interrupted() would — so observing it set here proves
        // boundedPar re-asserted before throwing
        case _: InterruptedException =>
          flagReasserted = Some(Thread.currentThread().isInterrupted)
      })
    try {
      t.start()
      firstRunning.await(30, java.util.concurrent.TimeUnit.SECONDS) shouldBe true
      t.interrupt() // the caller blocks in future.get() — this lands there
      t.join(30000)
      t.isAlive shouldBe false
      flagReasserted shouldBe Some(true)
      started.get() should be < 8 // shutdownNow drained the queue here too
    } finally gate.countDown()
  }

  test("poolWidth: graft.catalog.pool system property overrides, a non-positive or non-integer value fails loudly") {
    if (!sys.env.contains("GRAFT_CATALOG_POOL"))
      CatalogCommit.poolWidth shouldBe 8
    sys.props("graft.catalog.pool") = "3"
    try CatalogCommit.poolWidth shouldBe 3
    finally sys.props -= "graft.catalog.pool"
    Seq("zero", "0", "-2").foreach { bad =>
      sys.props("graft.catalog.pool") = bad
      try intercept[IllegalArgumentException](CatalogCommit.poolWidth).getMessage should include("positive")
      finally sys.props -= "graft.catalog.pool"
    }
  }
}
