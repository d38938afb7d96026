package graft.compact

import java.io.File
import java.nio.file.Files

import scala.util.Random

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Seeded randomized exercise of the catalog snapshot protocol: a long
  * interleaving of publishes, torn-debris injections, racer seals, and
  * snapshot expiry, checked after every step against a driver-side
  * model of what the chain must pin. The deterministic seams
  * (CatalogCommitSpec) pin each race branch once; this spec grinds the
  * COMPOSITION — debris stacked on debris, a racer directly behind a
  * burned gap, expiry sweeping under all of it — where protocol bugs
  * actually live.
  */
class CatalogFuzzSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-catfuzz").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  private def sealedJson(seq: Long, pins: Map[String, Long]): Array[Byte] = {
    val body = pins.toSeq.sortBy(_._1).map { case (p, s) => s"""{"p":"$p","s":$s}""" }.mkString("[", ",", "]")
    s"""{"seq":$seq,"leaves":$body,"sealed":true}""".getBytes
  }

  private def snapName(seq: Long) = f"_cat-$seq%09d.json"

  test("random publish/debris/racer/expire interleavings: the chain never loses an acknowledged pin, never resolves a torn file, and expiry respects the retained floor") {
    Seq(7L, 1234L, 987654L).foreach(grind(_, groups = None))
  }

  test("the same grind in the two-level GROUPED layout — every publish re-grouped, racer seals flip the chain back to inline (forced re-migration), expiry GCs group manifests under it all") {
    Seq(7L, 1234L, 987654L).foreach(grind(_, groups = Some(3)))
  }

  test("the grind under a TRANSIENT-UNREADABLE axis: a random root snapshot is deny-read around each publish/expire — every injected failure is LOUD (IOException, only when injected) and the resolved chain still matches the model exactly (r19 prescription 7)") {
    Seq(7L, 1234L, 987654L).foreach(grind(_, groups = None, flaky = true))
  }

  test("the same transient-unreadable grind in the GROUPED layout — the fourth-state guard paths (unreadable collision, unreadable above, poisoned GC scan) under randomized composition") {
    Seq(7L, 1234L, 987654L).foreach(grind(_, groups = Some(3), flaky = true))
  }

  private def grind(seed: Long, groups: Option[Int], flaky: Boolean = false): Unit = {
    val rnd = new Random(seed)
    val cat = new File(root, s"cat-${if (flaky) "f-" else ""}${groups.fold("")(g => s"g$g-")}$seed").getAbsolutePath
    new File(cat).mkdirs()
    // flaky axis: CatalogCommit operations go through the flakycat
    // scheme so a chosen ROOT SNAPSHOT name can be made unreadable for
    // exactly one operation. Deny targets derive from the MODEL's seq
    // space (never from a listing), keeping the rnd stream and the
    // denied name deterministic per seed; group manifests carry a
    // UUID — denying them here would break seed reproducibility, and
    // their unreadable paths are pinned deterministically in
    // CatalogCommitSpec (pin heal, strict floors, poisoned GC).
    if (flaky) spark.sparkContext.hadoopConfiguration
      .set("fs.flakycat.impl", classOf[FlakyCatFs].getName)
    val catUri = if (flaky) s"flakycat:$cat" else cat
    val members = Seq("leafA", "leafB", "leafC")
    // the MODEL: what an acknowledged (non-throwing) publish history
    // must pin, plus which seqs are expired. Racer seals update the
    // model too — they are sealed snapshots like any other.
    var model = Map.empty[String, Long]
    var modelSeq = 0L
    var expiredBelow = 1L
    var acknowledged = 0
    val history = scala.collection.mutable.Map.empty[Long, Map[String, Long]]
    // root files ACTUALLY removed (expire deletes can fail or be won by
    // a racer): below-floor seqs not in here are sealed SURVIVORS and
    // must keep resolving exactly — the r19 protection property
    val gone = scala.collection.mutable.Set.empty[Long]

    // flaky axis: ~1/3 of publish/expire steps run with one root
    // snapshot name unreadable. The NAME is drawn from the model's seq
    // neighborhood (past roots, the head, the next in-flight seq), so
    // the deny can land on the file currentRoot wants, on a guard-2
    // audit target, or on a GC-scan root. Zero extra rnd draws when
    // the axis is off — the non-flaky grinds keep their historical
    // op sequences per seed.
    def denyTarget(): Option[String] =
      if (!flaky || rnd.nextInt(3) != 0) None
      else Some(snapName(1L + rnd.nextInt(math.max(1, (modelSeq + 2L).toInt))))
    def withDeny[A](name: Option[String])(op: => A): A = {
      name.foreach(n => FlakyCatFs.denyOpen = Set(n))
      try op
      finally FlakyCatFs.denyOpen = Set.empty
    }

    (1 to 120).foreach { _ =>
      rnd.nextInt(10) match {
        case d if d <= 4 => // a normal publish of 1-3 member updates
          val updates = rnd.shuffle(members).take(1 + rnd.nextInt(3))
            .map(m => m -> (model.getOrElse(m, 0L) + 1L + rnd.nextInt(3))).toMap
          val deny = denyTarget()
          try {
            val snap = withDeny(deny)(
              CatalogCommit.publish(spark, catUri, updates, debrisWaitMs = 0L, groups = groups))
            // an acknowledged publish must carry the full merged model
            // (asserted AFTER the deny clears: forcing the map may
            // legitimately read carried group manifests)
            snap.leaves shouldBe (model ++ updates)
            model = model ++ updates
            modelSeq = snap.seq
            history(snap.seq) = model
            acknowledged += 1
          } catch {
            case _: ConcurrentCommitException =>
            // a loser must not have changed the RESOLVED chain: the
            // current snapshot still matches the model
            case _: java.io.IOException if deny.isDefined =>
            // the LOUD unreadable path (guard 1 unreadable collision,
            // guard 2 unreadable burned-seq/above, a denied group
            // parse): allowed ONLY when this step injected the fault,
            // and the publish must have retracted or never sealed —
            // the invariants below verify the chain equals the model
          }
        case 5 | 6 => // torn debris at the next seq (writer died mid-upload)
          val p = new File(cat, snapName(modelSeq + 1L + rnd.nextInt(2)))
          if (!p.exists()) { Files.write(p.toPath, s"""{"seq":${modelSeq + 1},""".getBytes); () }
        case 7 | 8 => // a RACER seals a complete snapshot at the next free seq
          val s0 = modelSeq + 1L
          val p = new File(cat, snapName(s0))
          if (!p.exists()) {
            val updates = Map(members(rnd.nextInt(members.size)) ->
              (model.values.maxOption.getOrElse(0L) + 10L + rnd.nextInt(5)))
            val pins = model ++ updates
            Files.write(p.toPath, sealedJson(s0, pins))
            model = pins
            modelSeq = s0
            history(s0) = model
          }
        case _ => // expire below a random retained floor — half the time
          // with FLAKY root deletes (fail-and-survive, or racer-won
          // "gone but reported false"): the survivor-protection and
          // no-poison-on-gone properties must hold under COMPOSITION
          // with debris, racers, and re-migrations, not just in the
          // deterministic specs
          if (modelSeq > 1L) {
            val keepFrom = expiredBelow + rnd.nextInt((modelSeq - expiredBelow + 1L).toInt).toLong
            // decision nonce drawn BEFORE the callbacks so the rnd
            // stream stays seed-deterministic even though the listing
            // order the callbacks fire in is fs-dependent
            val nonce = rnd.nextInt(1 << 20)
            val branch = rnd.nextBoolean()
            val deny = denyTarget() // a denied root poisons the GC scan: groups survive, roots still expire
            if (branch) { withDeny(deny)(CatalogCommit.expire(spark, catUri, keepFrom)); () }
            else withDeny(deny) {
              val fs = FileIndexer.fsFor(spark, catUri)
              CatalogCommit.expireImpl(fs, catUri, keepFrom, deleteRoot = p =>
                math.floorMod((p.getName + nonce).hashCode, 4) match {
                  case 0 => false // delete failed; the sealed survivor stays
                  case 1 => fs.delete(p, false); false // racer won: gone, reported false
                  case _ => fs.delete(p, false)
                })
              ()
            }
            expiredBelow = math.max(expiredBelow, keepFrom)
            history.keys
              .filter(s0 => s0 < expiredBelow && !new File(cat, snapName(s0)).exists())
              .foreach(gone += _)
          }
      }

      // INVARIANTS after every step (deny always cleared by here):
      val cur = CatalogCommit.current(spark, catUri)
      if (modelSeq > 0L) {
        withClue(s"seed=$seed: ") {
          cur.isDefined shouldBe true
          cur.get.seq shouldBe modelSeq // torn files never resolve; newest sealed wins
          cur.get.leaves shouldBe model // no acknowledged pin ever lost
        }
      }
      // retained history still reads exactly; removed history is gone;
      // a below-floor survivor of a FAILED delete is still a sealed
      // snapshot and must resolve exactly (its group manifests are
      // GC-protected) until a later expire actually removes it
      history.foreach { case (s0, pins) =>
        val at = CatalogCommit.snapshotAt(spark, catUri, s0)
        withClue(s"seed=$seed seq=$s0: ") {
          if (s0 >= expiredBelow) at.foreach(_.leaves shouldBe pins)
          else if (gone(s0)) at shouldBe None
          else {
            at.isDefined shouldBe true
            at.get.leaves shouldBe pins
          }
        }
      }
    }
    withClue(s"seed=$seed: ") { acknowledged should be > 10 }
  }
}
