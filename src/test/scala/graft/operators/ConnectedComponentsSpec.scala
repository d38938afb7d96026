package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class ConnectedComponentsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def labelsOf(edges: Seq[(Long, Long)], cap: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    ConnectedComponents.minLabel(edges.toDF("a", "b"), cap)
      .as[(Long, Long)].collect().toMap
  }

  /** Reference: driver-side BFS over the symmetrized adjacency. */
  private def ref(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val seen = scala.collection.mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!seen.contains(start)) {
        val comp = scala.collection.mutable.Set(start)
        val q = scala.collection.mutable.Queue(start)
        while (q.nonEmpty) adj(q.dequeue()).foreach(n => if (comp.add(n)) q.enqueue(n))
        val label = comp.min
        comp.foreach(n => seen(n) = label)
      }
    }
    seen.toMap
  }

  // chain (forces rounds ~ diameter in the distributed branch), a star,
  // a 2-cycle, an isolated edge — deliberately mixed shapes. Chain kept
  // short: min-label propagation needs ~length rounds, each a real
  // Spark job in the >cap branch.
  private val graph: Seq[(Long, Long)] =
    (0L until 12L).map(i => (i, i + 1)) ++ // chain 0..12
      Seq((100L, 101L), (100L, 102L), (100L, 103L)) ++ // star
      Seq((200L, 201L), (201L, 200L)) ++ // duplicate edge both ways
      Seq((300L, 301L))

  test("driver union-find branch (edges under cap) matches BFS reference") {
    labelsOf(graph, cap = 100000) shouldBe ref(graph)
  }

  test("distributed label-propagation branch (cap forced below edge count) matches the driver branch") {
    // cap=10 < 18 edges -> the >cap branch runs, including the per-round
    // localCheckpoint lineage cut (the 13-long chain needs many rounds)
    val big = labelsOf(graph, cap = 10)
    val small = labelsOf(graph, cap = 100000)
    big shouldBe small
    // chain collapses to min label 0
    big(12L) shouldBe 0L
    big(103L) shouldBe 100L
  }

  test("empty edge set yields an empty labeling from both branches") {
    labelsOf(Nil, cap = 100) shouldBe Map.empty
    labelsOf(Nil, cap = 0) shouldBe Map.empty // head(1) on empty -> small branch
  }

  test("convergence cadence: periodic check is exact and wastes at most K-1 rounds") {
    val s = spark
    import s.implicits._
    // chain of diameter D: propagation converges after D rounds (round
    // D+1 is the first no-change round under check-every-round). With
    // cadence K the loop stops at the first multiple of K where a
    // consecutive-round comparison sees no change.
    val chain = (0L until 8L).map(i => (i, i + 1))
    val (lab1, r1) = ConnectedComponents.minLabelStats(chain.toDF("a", "b"), cap = 3, convergenceCheckEvery = 1)
    val (lab3, r3) = ConnectedComponents.minLabelStats(chain.toDF("a", "b"), cap = 3, convergenceCheckEvery = 3)
    lab3.as[(Long, Long)].collect().toMap shouldBe lab1.as[(Long, Long)].collect().toMap
    lab3.as[(Long, Long)].collect().toMap shouldBe ref(chain)
    // K=3 stops at the first multiple of 3 >= the every-round count,
    // i.e. wastes at most 2 already-converged rounds
    r3 should be >= r1
    r3 should be <= (r1 + 2)
    r3 % 3 shouldBe 0
    // a star (diameter 2) converges almost immediately under both
    val star = Seq((10L, 11L), (10L, 12L), (10L, 13L))
    val (_, rs) = ConnectedComponents.minLabelStats(star.toDF("a", "b"), cap = 1, convergenceCheckEvery = 3)
    rs shouldBe 3
  }

  test("distributed branch keeps the plan bounded across rounds (localCheckpoint truncates lineage)") {
    val s = spark
    import s.implicits._
    // a chain needs ~diameter rounds of propagation; without a lineage
    // cut the final plan string grows with every round. A checkpointed
    // result plan is a scan, not a join tower.
    val chain = (0L until 15L).map(i => (i, i + 1))
    val out = ConnectedComponents.minLabel(chain.toDF("a", "b"), cap = 5)
    val plan = out.queryExecution.optimizedPlan.toString
    (plan should not).include("Join")
    out.as[(Long, Long)].collect().toMap shouldBe ref(chain)
  }
}
