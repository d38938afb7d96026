package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Warehouse-ETL operators: CDC upsert (MERGE without a table format),
  * SCD type-2 interval construction, and the `spark.sql` front end run
  * on the dialect intersection with the oracle.
  *
  * Money arithmetic follows the repo-wide discipline (CoreQueries
  * moneySum): exact DECIMAL aggregation cast to DOUBLE at the end, so
  * no float-summation order can make the engines disagree.
  */
object EtlQueries {

  /** The shared two-publish grouped-catalog fixture behind
    * `catalog_grouped` (head reads) and `catalog_time_travel`
    * (historical reads): orders hash-split across four member leaves,
    * published grouped (G=8) at seq 1, then ONE steady-state publish
    * (seq 2) after a delete on part1 — asserted to rewrite exactly one
    * group manifest — plus an UNPUBLISHED delete on part2 the pins
    * must isolate. Built once per sf dir under the StoreCache
    * publish-by-rename discipline; both queries resolve the same
    * store.
    */
  private def groupedCatalogStore(s: org.apache.spark.sql.SparkSession, d: String): String = {
    import graft.compact.{CatalogCommit, CommitMode, CompactorConfig, ManifestCommit, WapCommit}
    StoreCache.resolve(d, "catalog-grouped", table = "orders") { p =>
      val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)
      val stage = new org.apache.hadoop.fs.Path(p + ".stage")
      fs.delete(stage, true)
      val cat = s"$stage/cat"
      val cfg = CompactorConfig(
        commitMode = CommitMode.Manifest, retainSuperseded = true,
        statsColumns = Seq("o_orderkey"),
      )
      val members = (0 until 4).map(i => s"part$i")
      val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      members.zipWithIndex.foreach { case (leafRel, i) =>
        val part = orders.where(col("o_orderkey") % 4 === i)
          .repartitionByRange(2, col("o_orderkey")).sortWithinPartitions("o_orderkey")
        WapCommit.writeAuditPublish(
          s, s"$cat/$leafRel", part, Seq(WapCommit.AuditCheck.notNull("o_orderkey")), cfg)
      }
      def seqOf(leafRel: String) = ManifestCommit.currentSeq(s, s"$cat/$leafRel")
      def grpCount: Int = fs.listStatus(new org.apache.hadoop.fs.Path(cat))
        .count(_.getPath.getName.startsWith("_grp-"))
      CatalogCommit.publish(
        s, cat, members.map(m => m -> seqOf(m)).toMap, groups = Some(8))
      val g1 = grpCount
      // steady state: ONE member changes → ONE group manifest written
      ManifestCommit.deleteWhere(s, s"$cat/part1", col("o_orderkey") % 10 === 3, cfg)
        .foreach(r => if (!r.success) throw new IllegalStateException(s"part1 delete failed: ${r.error}"))
      CatalogCommit.publish(s, cat, Map("part1" -> seqOf("part1"))) // format carries forward
      if (grpCount != g1 + 1)
        throw new IllegalStateException(
          s"grouped publish touching one leaf wrote ${grpCount - g1} group manifests (want exactly 1)")
      // the lagging-leaf window on a CARRIED member: a commit on
      // part2 that is never published — the referenced pin isolates it
      ManifestCommit.deleteWhere(s, s"$cat/part2", col("o_orderkey") % 10 === 6, cfg)
        .foreach(r => if (!r.success) throw new IllegalStateException(s"part2 lag delete failed: ${r.error}"))
      val headCnt = ManifestCommit.readLeaf(s, s"$cat/part2").count()
      val pinCnt = CatalogCommit.readLeaf(s, cat, "part2").count()
      if (headCnt >= pinCnt)
        throw new IllegalStateException(
          s"grouped catalog pin is not isolating the unpublished commit (head $headCnt vs pinned $pinCnt)")
      fs.create(new org.apache.hadoop.fs.Path(s"$stage/_current-done"), true).close()
      if (!fs.rename(stage, new org.apache.hadoop.fs.Path(p)))
        throw new java.io.IOException(s"catalog-grouped store publish rename failed: $stage -> $p")
    }
  }

  /** Runs verbatim on BOTH engines — keep to the ANSI intersection:
    * no backticks, no engine-specific functions, DECIMAL money math.
    * (Declared before `qs`: object vals initialize in source order, and
    * `qs` captures this string at construction.)
    */
  private val q3Sql =
    """SELECT l_orderkey,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |       o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** DuckDB side of `layout_zorder`: the same 8-bit interleave written
    * out as explicit shift-mask-add terms (bit j of x → position 2j, of
    * y → 2j+1), generated once at object init so the two engines can
    * never drift apart term-by-term. (Before `qs` for the same
    * source-order reason as `q3Sql`.)
    */
  private val zorderOracleSql: String = {
    val terms = (0 until 8).flatMap { j =>
      Seq(
        s"((x >> $j) & 1) * ${1L << (2 * j)}",
        s"((y >> $j) & 1) * ${1L << (2 * j + 1)}",
      )
    }
    s"""WITH b AS (SELECT (l_partkey % 256) AS x, (l_suppkey % 256) AS y FROM lineitem),
       |z AS (SELECT x, y, ${terms.mkString(" + ")} AS zval FROM b)
       |SELECT CAST(zval >> 8 AS INTEGER) AS z_cell, count(*) AS n,
       |       CAST(min(x) AS INTEGER) AS min_x, CAST(max(x) AS INTEGER) AS max_x,
       |       CAST(min(y) AS INTEGER) AS min_y, CAST(max(y) AS INTEGER) AS max_y
       |FROM z GROUP BY z_cell ORDER BY z_cell""".stripMargin
  }

  val qs: Seq[Q] = Seq(

    // ----- CDC upsert: apply a change set onto a base table via FULL
    // OUTER join — the MERGE INTO shape without a table format. Change
    // rows win; base-only rows carry through; change-only rows insert.
    // At scale both sides shuffle once on the key (or the change side
    // broadcasts when small); the action column costs nothing extra.
    // Fixture: base = keys % 3 = 0, changes = keys % 2 = 0 with a 10%
    // price uplift computed in exact DECIMAL.
    Q(
      "upsert_cdc",
      """WITH base AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0),
        |chg AS (SELECT o_orderkey,
        |               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(3,2)) AS DOUBLE) AS new_price
        |        FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT coalesce(base.o_orderkey, chg.o_orderkey) AS o_orderkey,
        |       CASE WHEN base.o_orderkey IS NULL THEN 'inserted'
        |            WHEN chg.o_orderkey IS NULL THEN 'kept'
        |            ELSE 'updated' END AS action,
        |       coalesce(chg.new_price, base.o_totalprice) AS price
        |FROM base FULL JOIN chg ON base.o_orderkey = chg.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      val orders = Tables.orders(s, d)
      val base = orders.where(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").as("bk"), col("o_totalprice"))
      val chg = orders.where(col("o_orderkey") % 2 === 0)
        .select(
          col("o_orderkey").as("ck"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(3,2)) AS DOUBLE)")
            .as("new_price"),
        )
      base.join(chg, col("bk") === col("ck"), "full_outer")
        .select(
          coalesce(col("bk"), col("ck")).as("o_orderkey"),
          when(col("bk").isNull, "inserted")
            .when(col("ck").isNull, "kept")
            .otherwise("updated").as("action"),
          coalesce(col("new_price"), col("o_totalprice")).as("price"),
        )
        .orderBy("o_orderkey")
    },

    // ----- MERGE INTO as a TABLE-FORMAT commit (the real thing, not
    // the join shape above): a manifest leaf takes an upsert batch
    // through ManifestCommit.merge — matched keys' editions replaced,
    // unmatched keys inserted, untouched files never rewritten, ONE
    // sealed manifest as the commit point. The oracle recomputes the
    // upsert algebra directly (target minus source keys, union source),
    // so the hash certifies classification, the delete-aware rewrite,
    // the append of the source, and the manifest-resolved read — end to
    // end. The leaf is built once per corpus in the StoreCache (the
    // query prices the post-merge READ; MergeCommitSpec prices and pins
    // the commit itself, including NULL keys and MoR-sidecar folds).
    Q(
      "merge_upsert",
      """WITH target AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 4 <> 0),
        |source AS (
        |  SELECT o_orderkey, o_custkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 1000 AS DOUBLE) AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 <= 1)
        |SELECT o_orderkey, o_custkey, o_totalprice FROM target t
        |WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice FROM source
        |ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      import graft.compact.{CommitMode, CompactorConfig, ManifestCommit, WapCommit}
      val path = StoreCache.resolve(d, "merge-upsert", table = "orders") { p =>
        val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)
        val stage = new org.apache.hadoop.fs.Path(p + ".stage")
        fs.delete(stage, true)
        val leaf = s"$stage/leaf"
        // stats sidecars on the merge key: classification prunes to the
        // files whose key interval the source can touch
        val cfg = CompactorConfig(
          commitMode = CommitMode.Manifest, retainSuperseded = true,
          statsColumns = Seq("o_orderkey"),
        )
        val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val target = orders.where(col("o_orderkey") % 4 =!= 0)
          .repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey")
        WapCommit.writeAuditPublish(
          s, leaf, target, Seq(WapCommit.AuditCheck.notNull("o_orderkey")), cfg)
        val source = orders.where(col("o_orderkey") % 10 <= 1)
          .withColumn(
            "o_totalprice",
            expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 1000 AS DOUBLE)"))
        val r = ManifestCommit.merge(s, leaf, source, Seq("o_orderkey"), cfg)
          .getOrElse(throw new IllegalStateException("merge_upsert: empty source"))
        if (!r.success) throw new IllegalStateException(s"merge_upsert commit failed: ${r.error}")
        fs.create(new org.apache.hadoop.fs.Path(s"$stage/_current-done"), true).close()
        if (!fs.rename(stage, new org.apache.hadoop.fs.Path(p)))
          throw new java.io.IOException(s"merge-upsert store publish rename failed: $stage -> $p")
      }
      ManifestCommit.readLeaf(s, s"$path/leaf")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ----- merge-on-read DELETE, oracled end to end: a manifest leaf
    // takes a retention delete as ONE position sidecar (no data
    // rewrite), then a RANGE-TARGETED compaction folds the sidecar's
    // positions for half the key space and re-seals the rest as a
    // residual sidecar — the read must equal plain SQL row filtering
    // through BOTH representations at once (anti-joined positions over
    // untouched files + physically-folded rewrite + residual). The
    // DuckDB hash certifies the whole path: delete-aware matching,
    // sidecar anti-join at scan, whole-sidecar consumption with
    // residual handoff, and the manifest-resolved read.
    Q(
      "delete_where_mor",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderkey % 3 <> 0 AND o_orderkey % 7 <> 0
        |ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      import graft.compact.{CommitMode, CompactorConfig, ManifestCommit, WapCommit}
      val path = StoreCache.resolve(d, "delete-mor", table = "orders") { p =>
        val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)
        val stage = new org.apache.hadoop.fs.Path(p + ".stage")
        fs.delete(stage, true)
        val leaf = s"$stage/leaf"
        val cfg = CompactorConfig(
          commitMode = CommitMode.Manifest, retainSuperseded = true,
          statsColumns = Seq("o_orderkey"),
        )
        val target = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .where(col("o_orderkey") % 3 =!= 0)
          .repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey")
        WapCommit.writeAuditPublish(
          s, leaf, target, Seq(WapCommit.AuditCheck.notNull("o_orderkey")), cfg)
        val r = ManifestCommit.deleteWhereMoR(s, leaf, col("o_orderkey") % 7 === 0, cfg)
          .getOrElse(throw new IllegalStateException("delete_where_mor: nothing matched"))
        if (!r.success) throw new IllegalStateException(s"MoR delete failed: ${r.error}")
        // fold the sidecar for the LOWER half of the key range only —
        // the upper half's positions survive as the rewrite's residual
        val mid = Tables.orders(s, d).agg(max(col("o_orderkey"))).head.getLong(0) / 2
        ManifestCommit.compactWhere(s, leaf, "o_orderkey", 0.0, mid.toDouble, cfg)
          .foreach(cr => if (!cr.success) throw new IllegalStateException(s"fold failed: ${cr.error}"))
        if (ManifestCommit.liveDeletes(s, leaf).isEmpty)
          throw new IllegalStateException("delete_where_mor: expected a residual sidecar to survive the partial fold")
        fs.create(new org.apache.hadoop.fs.Path(s"$stage/_current-done"), true).close()
        if (!fs.rename(stage, new org.apache.hadoop.fs.Path(p)))
          throw new java.io.IOException(s"delete-mor store publish rename failed: $stage -> $p")
      }
      graft.compact.ManifestCommit.readLeaf(s, s"$path/leaf")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ----- UPDATE ... SET ... WHERE as a table-format commit: the
    // third DML primitive. Only the files containing cond=TRUE rows
    // are rewritten (sidecar-pruned classification), the assignments
    // apply to exactly those rows, the commit is row-preserving by
    // validation, and the manifest declares `mut` so feed consumers
    // replay it as retract+assert instead of netting the count-equal
    // rewrite to zero. The oracle recomputes the CASE expression over
    // the base table — the hash certifies classification, assignment
    // semantics (decimal-exact arithmetic), untouched-row identity,
    // and the manifest-resolved read.
    Q(
      "update_where",
      """SELECT o_orderkey, o_custkey,
        |       CASE WHEN o_orderkey % 10 = 3
        |            THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 1000 AS DOUBLE)
        |            ELSE o_totalprice END AS o_totalprice
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      import graft.compact.{CommitMode, CompactorConfig, ManifestCommit, WapCommit}
      val path = StoreCache.resolve(d, "update-where", table = "orders") { p =>
        val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)
        val stage = new org.apache.hadoop.fs.Path(p + ".stage")
        fs.delete(stage, true)
        val leaf = s"$stage/leaf"
        val cfg = CompactorConfig(
          commitMode = CommitMode.Manifest, retainSuperseded = true,
          statsColumns = Seq("o_orderkey"),
        )
        val target = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey")
        WapCommit.writeAuditPublish(
          s, leaf, target, Seq(WapCommit.AuditCheck.notNull("o_orderkey")), cfg)
        val r = ManifestCommit.updateWhere(
          s, leaf, col("o_orderkey") % 10 === 3,
          Map("o_totalprice" -> expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 1000 AS DOUBLE)")),
          cfg)
          .getOrElse(throw new IllegalStateException("update_where: nothing matched"))
        if (!r.success) throw new IllegalStateException(s"UPDATE failed: ${r.error}")
        fs.create(new org.apache.hadoop.fs.Path(s"$stage/_current-done"), true).close()
        if (!fs.rename(stage, new org.apache.hadoop.fs.Path(p)))
          throw new java.io.IOException(s"update-where store publish rename failed: $stage -> $p")
      }
      graft.compact.ManifestCommit.readLeaf(s, s"$path/leaf")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ----- keyed DELETE via EQUALITY sidecars, oracled end to end: the
    // string-doc_uid retention shape. The commit writes ONLY key tuples
    // + a bloom-resolved scope (zero data reads — the position path
    // still scans candidates to resolve ordinals); reads anti-join
    // scope-file rows on the keys; a range-targeted compaction then
    // folds the sidecar for the lower half of the id space (in-plan
    // kills resolve to positions and drop from the rewrite) and
    // re-seals the surviving scope as a residual equality sidecar. The
    // DuckDB hash certifies key-set semantics, the scope-bounded
    // anti-join, the fold/reseal handoff, and the manifest-resolved
    // read — through BOTH representations at once.
    Q(
      "delete_keys_mor",
      """SELECT doc_id, concat('doc-', CAST(doc_id AS VARCHAR)) AS doc_uid, lang, source, n_chars
        |FROM documents
        |WHERE doc_id % 7 <> 0
        |ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      import graft.compact.{CommitMode, CompactorConfig, ManifestCommit, WapCommit}
      val path = StoreCache.resolve(d, "delete-keys-mor", table = "documents") { p =>
        val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)
        val stage = new org.apache.hadoop.fs.Path(p + ".stage")
        fs.delete(stage, true)
        val leaf = s"$stage/leaf"
        // stats on the numeric id (range fold target), blooms on the
        // string key: the commit's scope prunes to possible-hit files
        val cfg = CompactorConfig(
          commitMode = CommitMode.Manifest, retainSuperseded = true,
          statsColumns = Seq("doc_id"), bloomColumns = Seq("doc_uid"),
        )
        val docs = Tables.documents(s, d)
          .select(
            col("doc_id"),
            concat(lit("doc-"), col("doc_id").cast("string")).as("doc_uid"),
            col("lang"), col("source"), col("n_chars"))
          .repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id")
        WapCommit.writeAuditPublish(
          s, leaf, docs, Seq(WapCommit.AuditCheck.notNull("doc_uid")), cfg)
        val keys = Tables.documents(s, d)
          .where(col("doc_id") % 7 === 0)
          .select(concat(lit("doc-"), col("doc_id").cast("string")).as("doc_uid"))
        val r = ManifestCommit.deleteKeysMoR(s, leaf, keys, cfg)
          .getOrElse(throw new IllegalStateException("delete_keys_mor: no possible match"))
        if (!r.success) throw new IllegalStateException(s"equality delete failed: ${r.error}")
        val mid = Tables.documents(s, d).agg(max(col("doc_id"))).head.getLong(0) / 2
        ManifestCommit.compactWhere(s, leaf, "doc_id", 0.0, mid.toDouble, cfg)
          .foreach(cr => if (!cr.success) throw new IllegalStateException(s"fold failed: ${cr.error}"))
        val resid = ManifestCommit.liveDeletes(s, leaf)
        if (!resid.exists(_.contains("/.eqdel-")))
          throw new IllegalStateException(
            s"delete_keys_mor: expected a residual equality sidecar to survive the partial fold, got $resid")
        fs.create(new org.apache.hadoop.fs.Path(s"$stage/_current-done"), true).close()
        if (!fs.rename(stage, new org.apache.hadoop.fs.Path(p)))
          throw new java.io.IOException(s"delete-keys-mor store publish rename failed: $stage -> $p")
      }
      graft.compact.ManifestCommit.readLeaf(s, s"$path/leaf")
        .select("doc_id", "doc_uid", "lang", "source", "n_chars")
        .orderBy("doc_id")
    },

    // ----- multi-leaf ATOMIC commit (CatalogCommit), oracled end to
    // end: a partitioned dataset (orders hash-split across two member
    // leaves) takes per-leaf CoW deletes, and ONE `_cat-<seq>.json`
    // create publishes BOTH new heads together — catalog readers flip
    // old-everything → new-everything in one PUT. The builder then
    // lands a THIRD commit on one leaf WITHOUT publishing (the lagging-
    // leaf crash window) and asserts the pin isolates it: the catalog
    // read must resolve every member THROUGH its pinned seq
    // (readLeafAt), never fall through to a leaf head. The DuckDB hash
    // certifies the pinned resolution on both members, the CoW deletes
    // under it, and the carried retention (superseded files stay
    // readable at the pin).
    Q(
      "catalog_commit",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE NOT (o_orderkey % 10 = 2) AND NOT (o_orderkey % 10 = 5)
        |ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      import graft.compact.{CatalogCommit, CommitMode, CompactorConfig, ManifestCommit, WapCommit}
      val path = StoreCache.resolve(d, "catalog-commit", table = "orders") { p =>
        val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)
        val stage = new org.apache.hadoop.fs.Path(p + ".stage")
        fs.delete(stage, true)
        val cat = s"$stage/cat"
        val cfg = CompactorConfig(
          commitMode = CommitMode.Manifest, retainSuperseded = true,
          statsColumns = Seq("o_orderkey"),
        )
        val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        Seq("east" -> 0, "west" -> 1).foreach { case (leafRel, parity) =>
          val part = orders.where(col("o_orderkey") % 2 === parity)
            .repartitionByRange(2, col("o_orderkey")).sortWithinPartitions("o_orderkey")
          WapCommit.writeAuditPublish(
            s, s"$cat/$leafRel", part, Seq(WapCommit.AuditCheck.notNull("o_orderkey")), cfg)
        }
        def seqOf(leafRel: String) = ManifestCommit.currentSeq(s, s"$cat/$leafRel")
        CatalogCommit.publish(s, cat, Map("east" -> seqOf("east"), "west" -> seqOf("west")))
        // per-leaf deletes, then ONE cross-leaf publish of both heads
        ManifestCommit.deleteWhere(s, s"$cat/east", col("o_orderkey") % 10 === 2, cfg)
          .foreach(r => if (!r.success) throw new IllegalStateException(s"east delete failed: ${r.error}"))
        ManifestCommit.deleteWhere(s, s"$cat/west", col("o_orderkey") % 10 === 5, cfg)
          .foreach(r => if (!r.success) throw new IllegalStateException(s"west delete failed: ${r.error}"))
        CatalogCommit.publish(s, cat, Map("east" -> seqOf("east"), "west" -> seqOf("west")))
        // the lagging-leaf window: a further commit on east that is
        // NEVER published — the pin must isolate it
        ManifestCommit.deleteWhere(s, s"$cat/east", col("o_orderkey") % 10 === 4, cfg)
          .foreach(r => if (!r.success) throw new IllegalStateException(s"east lag delete failed: ${r.error}"))
        val headCnt = ManifestCommit.readLeaf(s, s"$cat/east").count()
        val pinCnt = CatalogCommit.readLeaf(s, cat, "east").count()
        if (headCnt >= pinCnt)
          throw new IllegalStateException(
            s"catalog pin is not isolating the unpublished commit (head $headCnt vs pinned $pinCnt)")
        fs.create(new org.apache.hadoop.fs.Path(s"$stage/_current-done"), true).close()
        if (!fs.rename(stage, new org.apache.hadoop.fs.Path(p)))
          throw new java.io.IOException(s"catalog-commit store publish rename failed: $stage -> $p")
      }
      graft.compact.CatalogCommit.readLeaf(s, s"$path/cat", "east")
        .unionByName(graft.compact.CatalogCommit.readLeaf(s, s"$path/cat", "west"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ----- the TWO-LEVEL catalog layout (root → group manifests),
    // oracled end to end: orders hash-split across FOUR member leaves,
    // published grouped (G=8) so the root carries only group
    // references; a steady-state publish touching ONE leaf rewrites
    // exactly ONE group manifest (asserted in the builder — the
    // O(touched) publish contract at swarm scale), carries the other
    // members by reference, and a further UNPUBLISHED commit on a
    // different leaf is isolated by the pin. The DuckDB hash certifies
    // the pinned resolution through the grouped root on all four
    // members: the published delete is visible, the unpublished one is
    // not, and carried-by-reference pins read identically to rewritten
    // ones.
    Q(
      "catalog_grouped",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE NOT (o_orderkey % 4 = 1 AND o_orderkey % 10 = 3)
        |ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      val path = groupedCatalogStore(s, d)
      (0 until 4).map(i => graft.compact.CatalogCommit.readLeaf(s, s"$path/cat", s"part$i"))
        .reduce(_ unionByName _)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ----- catalog TIME TRAVEL through the grouped root, oracled: the
    // rows a published delete removed between snapshot 1 and head on
    // ONE member leaf, computed as readLeafAt(snap 1) EXCEPT the
    // current pinned read — the audit/rollback shape ("what did that
    // publish change?"). Exercises the r19 LAZY historical path end to
    // end in the oracle gate: snapshotAt parses the root only, the
    // single-leaf read resolves exactly one group manifest of the
    // historical root (spec-pinned by deletion of every other group in
    // CatalogCommitSpec; here the DuckDB hash certifies the VALUES the
    // lazy pin resolves to). Reuses the catalog_grouped store — same
    // two-publish history, no second build.
    Q(
      "catalog_time_travel",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderkey % 4 = 1 AND o_orderkey % 10 = 3
        |ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      import graft.compact.CatalogCommit
      val path = groupedCatalogStore(s, d)
      val snap1 = CatalogCommit.snapshotAt(s, s"$path/cat", 1L).getOrElse(
        throw new IllegalStateException("catalog-grouped store lost snapshot 1"))
      CatalogCommit.readLeafAt(s, s"$path/cat", "part1", snap1)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .except(
          CatalogCommit.readLeaf(s, s"$path/cat", "part1")
            .select("o_orderkey", "o_custkey", "o_totalprice"))
        .orderBy("o_orderkey")
    },

    // ----- data-quality expectations audit (the dbt-test / Deequ
    // shape): a battery of declared table checks, each one scalar
    // violation count, unioned into one report — the gate a pipeline
    // runs before promoting a batch. Checks span the classes that
    // matter: uniqueness (duplicate keys), completeness (nulls),
    // referential integrity both directions (orphans / childless),
    // domain ranges, and a cross-table temporal rule. Each check is an
    // independent aggregate over one scan-shaped plan (the anti-joins
    // broadcast their key side or shuffle once); zero-violation rows
    // are part of the contract — the report proves the checks RAN.
    Q(
      "etl_expectations",
      """WITH checks AS (
        |  SELECT 'customers_without_orders' AS check_name,
        |         (SELECT count(*) FROM customer c
        |          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS violations
        |  UNION ALL
        |  SELECT 'orders_without_lineitems',
        |         (SELECT count(*) FROM orders o
        |          WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
        |  UNION ALL
        |  SELECT 'orphan_lineitems',
        |         (SELECT count(*) FROM lineitem l
        |          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL
        |  SELECT 'duplicate_orderkeys',
        |         (SELECT count(*) FROM
        |            (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1))
        |  UNION ALL
        |  SELECT 'null_custkeys',
        |         (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
        |  UNION ALL
        |  SELECT 'discount_out_of_range',
        |         (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1)
        |  UNION ALL
        |  SELECT 'shipped_before_ordered',
        |         (SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |          WHERE l.l_shipdate < o.o_orderdate))
        |SELECT check_name, CAST(violations AS BIGINT) AS violations
        |FROM checks ORDER BY check_name""".stripMargin,
    ) { (s, d) =>
      val cust = Tables.customer(s, d)
      val orders = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      // each check: a LAZY 1-row aggregate — the whole report is one
      // plan, one job; never a driver-side count() loop
      def one(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("violations"))
          .select(lit(name).as("check_name"), col("violations"))
      val report = Seq(
        one("customers_without_orders",
          cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")),
        one("orders_without_lineitems",
          orders.join(li, orders("o_orderkey") === li("l_orderkey"), "left_anti")),
        one("orphan_lineitems",
          li.join(orders, li("l_orderkey") === orders("o_orderkey"), "left_anti")),
        one("duplicate_orderkeys",
          orders.groupBy("o_orderkey").agg(count(lit(1)).as("n")).where(col("n") > 1)),
        one("null_custkeys", orders.where(col("o_custkey").isNull)),
        one("discount_out_of_range",
          li.where(col("l_discount") < 0 || col("l_discount") > 0.1)),
        one("shipped_before_ordered",
          li.join(orders, li("l_orderkey") === orders("o_orderkey"))
            .where(col("l_shipdate") < col("o_orderdate"))),
      ).reduce(_ unionByName _)
      report.orderBy("check_name")
    },

    // ----- SCD type-2 intervals: collapse each user's event stream to
    // its TYPE CHANGES, then stamp validity windows — valid_from at the
    // change, valid_to when the next change arrives (NULL = current
    // version). Two window passes over one (user, time) sort; at scale
    // that is a single shuffle on user_id reused by both windows.
    Q(
      "scd2_intervals",
      """WITH e AS (SELECT user_id, ts, event_id, event_type,
        |                  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |           FROM events),
        |chg AS (SELECT user_id, ts, event_id, event_type FROM e
        |        WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS version,
        |       event_type, ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |FROM chg ORDER BY user_id, version""".stripMargin,
    ) { (s, d) =>
      val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(byTime))
        .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .select(
          col("user_id"),
          row_number().over(byTime).cast("int").as("version"),
          col("event_type"),
          col("ts").as("valid_from"),
          lead("ts", 1).over(byTime).as("valid_to"),
        )
        .orderBy("user_id", "version")
    },

    // ----- the spark.sql front end, on the dialect intersection: ONE
    // SQL string is both the Spark input and the DuckDB oracle (TPC-H
    // Q3 shape — shipping priority). Demonstrates that the engine's SQL
    // surface, not just the DataFrame API, matches the oracle. Catalyst
    // plans the 3-way join identically to the DataFrame form (broadcast
    // dims, pushed date filters).
    Q("sql_api_q3", EtlQueries.q3Sql) { (s, d) =>
      Q.withTempViews(s)(
        "customer" -> Tables.customer(s, d),
        "orders" -> Tables.orders(s, d),
        "lineitem" -> Tables.lineitem(s, d),
      ) {
        s.sql(q3Sql)
      }
    },

    // ----- keep-newest-per-key: the compaction primitive under every
    // CDC table — one row_number window over (key, time DESC), rank 1
    // survives. Single shuffle on the key; at scale this is the
    // standard "latest snapshot" materialization.
    Q(
      "dedup_keep_latest",
      """WITH r AS (SELECT user_id, event_id, event_type, ts,
        |                  row_number() OVER (PARTITION BY user_id
        |                                     ORDER BY ts DESC, event_id DESC) AS rn
        |           FROM events)
        |SELECT user_id, event_id, event_type, ts AS latest_ts
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts").as("latest_ts"))
        .orderBy("user_id")
    },

    // ----- Z-order layout (operators.ZOrder): Morton-interleave the low
    // 8 bits of two keys and aggregate per 256-code Z-range. Each range
    // is exactly a 16x16 tile in (x, y) space, so every cell's bounding
    // box comes back [16-wide, 16-tall] — the tight two-dimensional
    // min/max that makes Z-laid-out files prunable on EITHER key. The
    // oracle recomputes the interleave with the same integer arithmetic.
    Q("layout_zorder", EtlQueries.zorderOracleSql) { (s, d) =>
      import graft.operators.ZOrder
      val li = Tables.lineitem(s, d)
        .select((col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y"))
      li.withColumn("zval", ZOrder.mortonCode(8, col("x"), col("y")))
        .groupBy(shiftright(col("zval"), 8).cast("int").as("z_cell"))
        .agg(
          count(lit(1)).as("n"),
          min("x").cast("int").as("min_x"),
          max("x").cast("int").as("max_x"),
          min("y").cast("int").as("min_y"),
          max("y").cast("int").as("max_y"),
        )
        .orderBy("z_cell")
    },
  )
}
