package graft

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.types.LongType

import graft.store.{FileStats, ManifestShards, TableStore}

/** The sharded manifest tier (VERDICT r5 #2): above the inline threshold a
  * snapshot's per-file metadata lives in parquet shards and the snapshot
  * JSON is an O(#shards) manifest list. These specs assert the three scale
  * contracts — (1) correctness parity with the inline tier on every
  * commit/read path, (2) shard-level inheritance across incremental
  * commits, (3) the driver never materializes a full file list on the
  * commit/plan/maintenance hot paths (guarded by an explicit counter). */
class ShardedManifestSpec extends SparkSuite {
  import spark.implicits._

  private def withThreshold[A](n: Int, filesPerShard: Int = 8192)(f: => A): A = {
    spark.conf.set("spark.graft.manifest.inlineThreshold", n.toString)
    spark.conf.set("spark.graft.manifest.filesPerShard", filesPerShard.toString)
    try f finally {
      spark.conf.unset("spark.graft.manifest.inlineThreshold")
      spark.conf.unset("spark.graft.manifest.filesPerShard")
    }
  }

  private def scanFileCount(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val v1 = plan.collect { case s: FileSourceScanExec =>
      s.metrics("numFiles").value }
    // DSv2 route (the SQL catalog): count distinct files across the scan's
    // planned input partitions
    val v2 = plan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        s.inputRDD.partitions.flatMap {
          case d: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
            d.inputPartitions.flatMap {
              case f: org.apache.spark.sql.execution.datasources.FilePartition =>
                f.files.map(_.urlEncodedPath)
              case _ => Nil
            }
          case _ => Nil
        }.distinct.length.toLong
    }
    assert(v1.nonEmpty || v2.nonEmpty, s"no file scan in:\n$plan")
    v1.sum + v2.sum
  }

  test("plain sharded commit: roundtrip, totals, and stats-based file skipping") {
    withThreshold(4) {
      val store = new TableStore(spark, graft.util.Scratch.dir("shard_plain"))
      val df = spark.range(0, 1000).select($"id".as("k"), ($"id" % 7).as("v"))
      store.commitSnapshot(
        df.repartitionByRange(10, $"k").sortWithinPartitions("k"))
      val m = store.manifest(0)
      assert(m.isSharded, "10 files over threshold 4 must shard")
      assert(m.inlineFiles.isEmpty && m.inlineStats.isEmpty)
      assert(m.nFiles == 10 && m.totalRows == 1000)
      assert(store.readSnapshot().count() == 1000)
      assert(store.readSnapshot().filter($"k" === 500L)
        .select("v").as[Long].head() == 500 % 7)
      // the sorted layout gives each file a narrow k-range: a point filter
      // must open exactly one of the ten files (distributed metadata prune)
      assert(scanFileCount(store.readSnapshot().filter($"k" === 500L)) == 1)
      assert(scanFileCount(store.readSnapshot()) == 10)
    }
  }

  test("bucketed sharded manifests: incremental commits inherit untouched shards by reference") {
    withThreshold(8, filesPerShard = 8) {
      val store = new TableStore(spark, graft.util.Scratch.dir("shard_bucketed"))
      val base = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("v"))
      store.commitBucketed(base, Seq("k"), 32)
      val m0 = store.manifest(0)
      assert(m0.isSharded)
      assert(store.readSnapshot().count() == 1000)

      val hot = Seq(5L, 6L)
      val touched = base.filter($"k".isin(hot: _*))
        .select(TableStore.bucketExpr(Seq("k"), 32).as("b"))
        .distinct().as[Long].collect().toSeq
      val upd = hot.map(k => (k, -1L)).toDF("k", "v")
      val newContent = store.readBuckets(touched)
        .filter(!$"k".isin(hot: _*)).union(upd)
      store.commitIncremental(newContent, touched, expectedParent = Some(0L))

      val m1 = store.manifest(1)
      assert(m1.isSharded)
      // every shard covering no touched bucket is inherited at its path
      val touchedSet = touched.toSet
      val inheritable = m0.shards.filter(_.buckets.forall(b => !touchedSet(b)))
      assert(inheritable.nonEmpty, "fixture must leave untouched shards")
      inheritable.foreach(r => assert(m1.shards.exists(_.path == r.path),
        s"untouched shard not inherited: ${r.path}"))
      // the diff is O(touched buckets), not O(table)
      val (added, removed) = store.changedFilesBetween(0, 1)
      assert(removed.nonEmpty && removed.size < m0.nFiles / 2,
        s"diff listed ${removed.size} of ${m0.nFiles} files")
      removed.foreach(f => assert(
        TableStore.bucketOfFile(f).exists(touchedSet), s"untouched removed: $f"))
      // row correctness after the merge
      assert(store.readSnapshot().filter($"k".isin(hot: _*))
        .select("v").as[Long].collect().toSet == Set(-1L))
      assert(store.readSnapshot().count() == 1000)
      // bucket-targeted read opens only covering shards' files
      assert(store.readBuckets(touched).count() ==
        store.readSnapshot().filter(
          TableStore.bucketExpr(Seq("k"), 32).isin(touched: _*)).count())
      // row-level changelog across the sharded diff
      val cl = store.readChangelog(0, 1, Seq("k"))
      val byType = cl.groupBy("_change_type").count().as[(String, Long)]
        .collect().toMap
      assert(byType == Map("UPDATE" -> 2L), s"changelog: $byType")
    }
  }

  test("append inherits every parent shard; tier transition lifts an inline table to sharded") {
    withThreshold(8) {
      val store = new TableStore(spark, graft.util.Scratch.dir("shard_append"))
      val a = spark.range(0, 100).select($"id".as("k"), $"id".as("v"))
      store.commitSnapshot(a.repartition(4)) // 4 files: inline
      assert(!store.manifest(0).isSharded)
      val b = spark.range(100, 200).select($"id".as("k"), $"id".as("v"))
      store.commitAppend(b.repartition(6)) // 10 total: crosses the threshold
      val m1 = store.manifest(1)
      assert(m1.isSharded, "append crossing the threshold must transition tiers")
      assert(m1.nFiles == 10 && store.readSnapshot().count() == 200)
      // mixed-tier diff (inline from, sharded to) still lists only additions
      val (added, removed) = store.changedFilesBetween(0, 1)
      assert(removed.isEmpty && added.size == 6)
      // sharded parent append: all parent shards inherited by reference
      val c = spark.range(200, 300).select($"id".as("k"), $"id".as("v"))
      store.commitAppend(c.repartition(3))
      val m2 = store.manifest(2)
      assert(m2.isSharded && m2.nFiles == 13)
      m1.shards.foreach(r => assert(m2.shards.exists(_.path == r.path),
        "append rewrote a parent shard"))
      assert(store.readSnapshot().count() == 300)
      // MIXED-TIER vacuum: survivors v0 (inline) + v1/v2 (sharded) build the
      // referenced set from a union of both tiers — nothing referenced dies
      store.vacuum(keepSnapshots = 3)
      assert(store.existingVersions() == Seq(0L, 1L, 2L))
      assert(store.readSnapshot(0).count() == 100)
      assert(store.readSnapshot().count() == 300)
      // then expire down to the sharded head: inline v0's unshared files go
      store.vacuum(keepSnapshots = 1)
      assert(store.existingVersions() == Seq(2L))
      assert(store.readSnapshot().count() == 300)
    }
  }

  test("racing sharded commits: CAS losers clean their shard dirs, no orphans") {
    withThreshold(0, filesPerShard = 1) { // every commit writes a sharded manifest
      val root = graft.util.Scratch.dir("shard_race")
      val store = new TableStore(spark, root)
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 2).map { t =>
        new Thread(() => {
          try {
            for (i <- 0 until 4) {
              var done = false
              while (!done) {
                try {
                  store.commitSnapshot(Seq((t.toLong, i.toLong)).toDF("w", "i"))
                  done = true
                } catch { case _: IllegalStateException => () } // lost CAS; retry
              }
            }
          } catch { case e: Throwable => errors.add(e) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errors.isEmpty, s"unexpected: ${errors.peek()}")
      assert(store.currentVersion() == 7L)
      store.existingVersions().foreach { v =>
        assert(store.manifest(v).isSharded)
        assert(store.readSnapshot(v).count() == 1)
      }
      // losers removed their staged shard dirs: exactly one per committed
      // version remains under manifest/shards
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val shardDirs = fs.listStatus(
        new org.apache.hadoop.fs.Path(root, "manifest/shards"))
        .count(_.isDirectory)
      assert(shardDirs == 8, s"orphaned shard dirs: $shardDirs != 8 commits")
    }
  }

  test("file-replace commits rewrite only the affected shards; vacuum sweeps shard dirs and superseded files") {
    withThreshold(2, filesPerShard = 2) {
      val root = graft.util.Scratch.dir("shard_replace")
      val store = new TableStore(spark, root)
      val df = spark.range(0, 400).select($"id".as("k"), ($"id" % 3).as("v"))
      store.commitSnapshot(
        df.repartitionByRange(8, $"k").sortWithinPartitions("k"))
      val m0 = store.manifest(0)
      assert(m0.isSharded && m0.nFiles == 8)
      // replace the files that might hold k=42 (stats-pruned: one file)
      val attr = AttributeReference("k", LongType)()
      val victims = store.pruneCandidatePaths(m0,
        Seq(EqualTo(attr, Literal(42L))))
      assert(victims.size == 1, s"sorted layout should pin one file: $victims")
      val keepRows = store.readFiles(m0, victims).filter($"k" =!= 42L)
      store.commitReplaceFiles(victims, keepRows, expectedParent = Some(0L))
      val m1 = store.manifest(1)
      assert(store.readSnapshot().count() == 399)
      assert(store.readSnapshot().filter($"k" === 42L).count() == 0)
      // untouched shards inherited (the victim's shard was rewritten)
      val inherited = m1.shards.map(_.path).toSet
        .intersect(m0.shards.map(_.path).toSet)
      assert(inherited.nonEmpty, "replace rewrote every shard")

      // vacuum: expiring snapshot 0 must GC its unreferenced shard files
      // and the replaced data file, while snapshot 1 stays readable
      store.vacuum(keepSnapshots = 1)
      assert(store.existingVersions() == Seq(1L))
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      victims.foreach(f => assert(
        !fs.exists(new org.apache.hadoop.fs.Path(f)), s"superseded file kept: $f"))
      val shardsRoot = new org.apache.hadoop.fs.Path(root, "manifest/shards")
      val liveShards = m1.shards.map(r =>
        fs.makeQualified(new org.apache.hadoop.fs.Path(r.path)).toString).toSet
      val onDisk = {
        val it = fs.listFiles(shardsRoot, true)
        val acc = scala.collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) {
          val s = it.next()
          if (s.isFile && s.getPath.getName.endsWith(".parquet"))
            acc += fs.makeQualified(s.getPath).toString
        }
        acc.toSet
      }
      assert(onDisk == liveShards,
        s"shard GC mismatch: onDisk=${onDisk.size} live=${liveShards.size}")
      assert(store.readSnapshot().count() == 399)
    }
  }

  test("large bucketed commit never materializes the file list on the driver") {
    // default inline threshold (1000) — the table shards because it is big;
    // 128 buckets > driver-listing cutoff, so listing, footer stats, shard
    // writes, pruning, diffs, and maintenance all run as Spark jobs
    val store = new TableStore(spark, graft.util.Scratch.dir("shard_big"))
    val df = spark.range(0, 15000)
      .select($"id".as("k"), ($"id" % 97).as("v"))
      .repartition(32)
    val before = TableStore.driverMaterializations.get()
    // cluster = false keeps the 32-task × 128-bucket fan-out — the cheap
    // way to fabricate a >1000-file table (the r10 default clusters to one
    // file per bucket, which is exactly what this fixture must NOT do)
    store.commitBucketed(df, Seq("k"), 128, cluster = false)
    val m0 = store.manifest(0)
    assert(m0.isSharded, s"${m0.nFiles} files should exceed the threshold")
    assert(m0.nFiles > 1000, s"fixture too small: ${m0.nFiles}")
    assert(m0.totalRows == 15000)
    // the snapshot JSON is a manifest LIST: O(#shards), not O(#files)
    val jsonLen = new java.io.File(s"${store.root}/manifest/v0.json").length()
    assert(jsonLen < 64 * 1024,
      s"manifest list is $jsonLen bytes — scales with files, not shards?")
    // metadata relation serves totals distributed
    assert(store.fileMetaDS(m0).count() == m0.nFiles)
    // filtered + full reads
    assert(store.readSnapshot().filter($"k" === 7L).select("v")
      .as[Long].head() == 7L % 97)
    assert(store.readSnapshot().count() == 15000)
    // incremental commit over one bucket
    val touched = Seq(TableStore.bucketExpr(Seq("k"), 128))
      .map(_ => spark.range(7, 8).select(
        TableStore.bucketExpr(Seq("id"), 128).as("b")).as[Long].head())
    val newContent = store.readBuckets(touched)
      .filter($"k" =!= 7L).union(Seq((7L, -1L)).toDF("k", "v"))
    store.commitIncremental(newContent, touched, expectedParent = Some(0L))
    assert(store.readSnapshot().filter($"k" === 7L).select("v")
      .as[Long].head() == -1L)
    val (_, removed) = store.changedFilesBetween(0, 1)
    assert(removed.size < 64, s"incremental diff removed ${removed.size} files")
    // maintenance planning + GC on the sharded store
    assert(store.bucketFileCounts(store.manifest(1)).size == 128)
    store.vacuum(keepSnapshots = 1)
    assert(store.readSnapshot().count() == 15000)
    // the guard: nothing above enumerated a full file list on the driver
    assert(TableStore.driverMaterializations.get() == before,
      "a hot path materialized the full file list on the driver")
  }

  test("SQL catalog over a sharded table: filtered reads, distributed files table, DELETE") {
    withThreshold(4, filesPerShard = 4) {
      val warehouse = java.nio.file.Files
        .createTempDirectory("graft_shard_cat").toString
      spark.conf.set("spark.sql.catalog.shard_cat",
        classOf[graft.catalog.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.shard_cat.warehouse", warehouse)
      val store = new TableStore(spark, s"$warehouse/ns/big")
      val df = spark.range(0, 1000).select($"id".as("k"), ($"id" % 5).as("v"))
      store.commitSnapshot(
        df.repartitionByRange(10, $"k").sortWithinPartitions("k"))
      val m = store.manifest(0)
      assert(m.isSharded)
      // filtered SQL read routes through the stats-pruning scan builder
      // (distributed metadata prune), and the answer is exact
      assert(spark.sql(
        "SELECT v FROM shard_cat.ns.big WHERE k = 500").as[Long].head() == 0L)
      assert(spark.sql(
        "SELECT count(*) FROM shard_cat.ns.big").as[Long].head() == 1000L)
      // $files is served straight off the manifest shards as a real
      // distributed parquet scan — aggregate without driver materialization
      val before = TableStore.driverMaterializations.get()
      val nf = spark.sql(
        "SELECT count(*) FROM shard_cat.ns.`big$files`").as[Long].head()
      assert(nf == m.nFiles)
      val rows = spark.sql(
        "SELECT sum(rows) FROM shard_cat.ns.`big$files`").as[Long].head()
      assert(rows == 1000L)
      assert(TableStore.driverMaterializations.get() == before,
        "files metadata read materialized the file list on the driver")
      // row-level SQL DELETE takes the sharded file-replace path
      spark.sql("DELETE FROM shard_cat.ns.big WHERE k = 500")
      assert(spark.sql(
        "SELECT count(*) FROM shard_cat.ns.big").as[Long].head() == 999L)
      assert(store.manifest(1).isSharded)
    }
  }

  test("CDC feed outgrowing the threshold transitions the tier mid-stream; diffs span the boundary") {
    withThreshold(6, filesPerShard = 4) {
      val store = new TableStore(spark, graft.util.Scratch.dir("shard_grow"))
      val keys = Seq("k")
      store.commitBucketed(
        (1L to 40L).map(i => (i, i * 10L)).toDF("k", "v")
          .repartition(4, TableStore.bucketExpr(keys, 4)),
        keys, numBuckets = 4)
      assert(!store.manifest(0).isSharded,
        s"expected inline start, got ${store.manifest(0).nFiles} files")
      // an incremental commit whose bucket rewrite fans out to many files
      // pushes the table over the threshold: the commit itself performs the
      // inline -> sharded transition
      def updateKey(k: Long, nFiles: Int): Unit = {
        val touched = Seq(Seq(k).toDF("k")
          .select(TableStore.bucketExpr(keys, 4).as("b")).as[Long].head())
        val newContent = store.readBuckets(touched)
          .filter($"k" =!= k).union(Seq((k, -k)).toDF("k", "v"))
          .repartition(nFiles)
        store.commitIncremental(newContent, touched)
      }
      updateKey(1L, nFiles = 7) // 3 inherited + up to 7 fresh > threshold 6
      val m1 = store.manifest(1)
      assert(m1.isSharded,
        s"commit should have transitioned tiers (${m1.nFiles} files)")
      // a further sharded incremental commit on top
      updateKey(2L, nFiles = 2)
      assert(store.manifest(2).isSharded)
      // content exact across the transition
      val expected = (1L to 40L).map(i =>
        (i, if (i <= 2) -i else i * 10L)).toDF("k", "v")
      assert(store.readSnapshot().count() == 40)
      assert(store.readSnapshot().exceptAll(expected).count() == 0)
      assert(expected.exceptAll(store.readSnapshot()).count() == 0)
      // diff + changelog spanning the inline->sharded boundary
      val (added, removed) = store.changedFilesBetween(0, 1)
      assert(added.nonEmpty && removed.nonEmpty)
      val cl = store.readChangelog(0, 2, keys)
      assert(cl.filter($"_change_type" === "UPDATE").count() == 2)
    }
  }

  test("sharded CDC soak: 14 micro-batches with maintenance keep shards, files, and content bounded and exact") {
    // the continuous 100 TB workload shape on the sharded tier: a CDC feed
    // of touched-bucket commits, periodic incremental compaction, and
    // snapshot expiry — shard inheritance, shard rewrites, shard-dir GC and
    // the distributed data sweep all interacting across many commits
    withThreshold(8, filesPerShard = 8) {
      val store = new TableStore(spark, graft.util.Scratch.dir("shard_soak"))
      val keys = Seq("k")
      val policy = graft.streaming.StreamingOps.CdcMaintenance(
        everyNCommits = 4, maxFilesPerBucket = 2, keepSnapshots = 2)
      store.commitBucketed((1L to 200L).map(i => (i, s"v$i")).toDF("k", "v"),
        keys, numBuckets = 16)
      assert(store.manifest(0).isSharded)
      var expected = (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v")
      for (i <- 1 to 14) {
        val batch = Seq(
          (i.toLong % 200 + 1, s"u$i", i.toLong, "MODIFY"),
          ((i.toLong * 7) % 200 + 1, s"w$i", i.toLong, "MODIFY"))
          .toDF("k", "v", "seq", "op")
        graft.streaming.StreamingOps.applyCdcBatch(batch, store, keys,
          numBuckets = 16, maintenance = Some(policy))
        expected = graft.etl.CdcApply(expected, batch, keys)
      }
      val m = store.manifest(store.currentVersion())
      assert(m.isSharded, "soak must stay on the sharded tier")
      // bucket file counts bounded (distributed metadata aggregation)
      val perBucket = store.bucketFileCounts(m).filter(_._1 >= 0).values
      val bound = policy.maxFilesPerBucket + policy.everyNCommits
      assert(perBucket.forall(_ <= bound),
        s"unbounded bucket growth: ${perBucket.toSeq.sorted.reverse}")
      assert(store.existingVersions().size <=
        policy.keepSnapshots + policy.everyNCommits)
      // shard-dir GC: on-disk shard files == exactly the survivors' refs
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val liveShards = store.existingVersions()
        .flatMap(v => store.manifest(v).shards.map(r =>
          fs.makeQualified(new org.apache.hadoop.fs.Path(r.path)).toString))
        .toSet
      val shardsOnDisk = {
        val it = fs.listFiles(
          new org.apache.hadoop.fs.Path(store.root, "manifest/shards"), true)
        val acc = scala.collection.mutable.Set[String]()
        while (it.hasNext) {
          val s = it.next()
          if (s.getPath.getName.endsWith(".parquet"))
            acc += fs.makeQualified(s.getPath).toString
        }
        acc.toSet
      }
      assert(shardsOnDisk == liveShards,
        s"shard GC drift: ${shardsOnDisk.size} on disk vs ${liveShards.size} live")
      // data files on disk <= referenced (distributed sweep reclaimed the rest)
      val referenced = store.fileMetaDS(m).count() +
        store.existingVersions().dropRight(1)
          .map(v => store.fileMetaDS(store.manifest(v)).count()).sum
      val dataOnDisk = {
        val it = fs.listFiles(
          new org.apache.hadoop.fs.Path(store.root, "data"), true)
        var n = 0
        while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
        n
      }
      assert(dataOnDisk <= referenced,
        s"dead data files on disk: $dataOnDisk vs $referenced referenced")
      // content is exactly the LWW-merged expectation
      assert(store.readSnapshot().count() == expected.count())
      assert(store.readSnapshot().exceptAll(expected).count() == 0)
      assert(expected.exceptAll(store.readSnapshot()).count() == 0)
    }
  }

  test("SELECT point lookups on bucketed tables read only the key-derived buckets (VERDICT r6 #1)") {
    // hash-bucketed files carry near-full-range k stats, so stats pruning
    // alone keeps EVERY file; the key-derived bucket set is the only
    // narrowing that works — and it must engage on plain reads, not just
    // DELETE. Both tiers, plus the required negative cases.
    def bucketOf(k: Long, n: Int): Long =
      Seq(k).toDF("k").select(TableStore.bucketExpr(Seq("k"), n).as("b"))
        .as[Long].head()
    def filesInBuckets(m: TableStore.Manifest, store: TableStore,
        bs: Set[Long]): Long =
      store.fileMetaDS(m).filter((fm: ManifestShards.FileMeta) =>
        bs.contains(fm.bucket)).count()

    // inline tier: 16 buckets, one file each
    val store = new TableStore(spark, graft.util.Scratch.dir("bucket_prune_inline"))
    val df = spark.range(0, 1000).select($"id".as("k"), ($"id" % 7).as("v"))
    store.commitBucketed(df.repartition(16, TableStore.bucketExpr(Seq("k"), 16)),
      Seq("k"), 16)
    val m = store.manifest(0)
    assert(!m.isSharded && m.nFiles > 1)
    val b500 = bucketOf(500L, 16)
    val expected = filesInBuckets(m, store, Set(b500))
    assert(expected < m.nFiles, "fixture must have >1 bucket populated")
    val point = store.readSnapshot().filter($"k" === 500L)
    assert(point.select("v").as[Long].head() == 500L % 7)
    assert(scanFileCount(store.readSnapshot().filter($"k" === 500L)) == expected,
      "point lookup must open only the key's bucket")
    // IN list: union of the pinned keys' buckets
    val inBuckets = Set(500L, 777L).map(bucketOf(_, 16))
    assert(scanFileCount(store.readSnapshot().filter($"k".isin(500L, 777L))) ==
      filesInBuckets(m, store, inBuckets))
    // negative: an OR branch never pins the key — no bucket pruning (and
    // hash-scattered k stats keep every file, proving stats alone don't cut)
    assert(scanFileCount(store.readSnapshot()
      .filter($"k" === 500L || $"v" === 3L)) == m.nFiles)
    // negative: non-literal comparison — no pruning
    assert(scanFileCount(store.readSnapshot().filter($"k" === $"v")) == m.nFiles)

    // sharded tier: the same contract, plus shard-level skipping
    withThreshold(8, filesPerShard = 8) {
      val sharded = new TableStore(spark, graft.util.Scratch.dir("bucket_prune_sharded"))
      sharded.commitBucketed(
        df.repartition(64, TableStore.bucketExpr(Seq("k"), 64)), Seq("k"), 64)
      val ms = sharded.manifest(0)
      assert(ms.isSharded)
      val b = bucketOf(500L, 64)
      val exp = filesInBuckets(ms, sharded, Set(b))
      assert(scanFileCount(sharded.readSnapshot().filter($"k" === 500L)) == exp)
      assert(sharded.readSnapshot().filter($"k" === 500L)
        .select("v").as[Long].head() == 500L % 7)
      // the SQL catalog read path prunes identically
      val warehouse = java.nio.file.Files
        .createTempDirectory("graft_bucket_prune").toString
      spark.conf.set("spark.sql.catalog.bp_cat",
        classOf[graft.catalog.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.bp_cat.warehouse", warehouse)
      val catStore = new TableStore(spark, s"$warehouse/ns/t")
      catStore.commitBucketed(
        df.repartition(16, TableStore.bucketExpr(Seq("k"), 16)), Seq("k"), 16)
      val mc = catStore.manifest(0)
      val expectedCat = filesInBuckets(mc, catStore, Set(bucketOf(500L, 16)))
      assert(scanFileCount(
        spark.sql("SELECT v FROM bp_cat.ns.t WHERE k = 500")) == expectedCat)
      assert(spark.sql("SELECT v FROM bp_cat.ns.t WHERE k = 500")
        .as[Long].head() == 500L % 7)
    }
  }

  test("vacuum never reclaims an in-flight commit's staging dirs (VERDICT r6 #8)") {
    withThreshold(0, filesPerShard = 2) {
      val root = graft.util.Scratch.dir("vac_inflight")
      val store = new TableStore(spark, root)
      store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
      store.commitAppend(Seq((2L, "b")).toDF("k", "v"))
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      def path(s: String) = new org.apache.hadoop.fs.Path(s)
      // simulate a writer caught MID-WRITE: staged data + shard bytes exist,
      // the manifest does not, and the sibling staging markers are fresh
      val stagedData = path(s"$root/data/snap-2-777-0")
      val stagedShards = path(s"$root/manifest/shards/v2-777-0")
      fs.mkdirs(stagedData); fs.mkdirs(stagedShards)
      fs.create(path(s"$root/data/snap-2-777-0/part-0.parquet"), true).close()
      fs.create(path(s"$root/manifest/shards/v2-777-0/shard-0.parquet"), true).close()
      fs.create(path(s"$root/data/.staging-snap-2-777-0"), true).close()
      fs.create(path(s"$root/manifest/shards/.staging-v2-777-0"), true).close()
      // a CRASHED writer's residue: same shape, marker aged past the grace
      val orphan = path(s"$root/data/snap-9-999-0")
      fs.mkdirs(orphan)
      fs.create(path(s"$root/data/snap-9-999-0/part-0.parquet"), true).close()
      fs.create(path(s"$root/data/.staging-snap-9-999-0"), true).close()
      fs.setTimes(path(s"$root/data/.staging-snap-9-999-0"), 1000L, -1)

      store.vacuum(keepSnapshots = 2) // sweep runs over both tiers
      assert(fs.exists(path(s"$root/data/snap-2-777-0/part-0.parquet")),
        "sweep deleted an in-flight writer's staged data")
      assert(fs.exists(path(s"$root/manifest/shards/v2-777-0/shard-0.parquet")),
        "sweep deleted an in-flight writer's staged shards")
      assert(!fs.exists(orphan), "crash residue past the grace must be reclaimed")
      assert(store.readSnapshot(0).count() == 1 && store.readSnapshot(1).count() == 2)

      // the grace expiring turns the in-flight dirs into reclaimable orphans
      fs.setTimes(path(s"$root/data/.staging-snap-2-777-0"), 1000L, -1)
      fs.setTimes(path(s"$root/manifest/shards/.staging-v2-777-0"), 1000L, -1)
      store.vacuum(keepSnapshots = 2)
      assert(!fs.exists(stagedData) && !fs.exists(stagedShards))
      assert(!fs.exists(path(s"$root/data/.staging-snap-2-777-0")),
        "stale marker must be cleaned with its dir")
    }
  }

  test("a marker orphaned by a crash AFTER commit is reclaimed within the grace") {
    // writer crashes between the manifest landing and endStaging: the dir is
    // committed and stays forever, so the dir-gone-plus-grace reclaim path
    // can never fire — the sweep must drop the marker because the dir's
    // manifest exists NOW
    val root = graft.util.Scratch.dir("vac_stalemark")
    val store = new TableStore(spark, root)
    store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    store.commitAppend(Seq((2L, "b")).toDF("k", "v"))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val dataDir = new org.apache.hadoop.fs.Path(s"$root/data")
    val dir = fs.listStatus(dataDir).map(_.getPath)
      .filter(_.getName.startsWith("snap-1-")).head
    val marker = new org.apache.hadoop.fs.Path(
      dir.getParent, s".staging-${dir.getName}")
    fs.create(marker, true).close() // fresh — inside the grace window
    store.vacuum(keepSnapshots = 5)
    assert(!fs.exists(marker),
      "marker of a committed dir must be reclaimed, not kept as litter")
    assert(fs.exists(dir), "the committed dir itself must survive")
    assert(store.readSnapshot(1).count() == 2)
  }

  test("concurrent vacuum loop under a committing writer: no lost files, all snapshots readable") {
    withThreshold(0, filesPerShard = 4) {
      val store = new TableStore(spark, graft.util.Scratch.dir("vac_race"))
      store.commitSnapshot(Seq((0L, "base")).toDF("k", "v"))
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val vacuumer = new Thread(() => {
        try while (!stop.get()) { store.vacuum(keepSnapshots = 1); Thread.sleep(3) }
        catch { case e: Throwable => errors.add(e) }
      })
      vacuumer.start()
      try {
        for (i <- 1 to 5)
          store.commitAppend(
            (1L to 20L).map(j => (i * 100L + j, s"v$i-$j")).toDF("k", "v")
              .repartition(4))
      } finally { stop.set(true); vacuumer.join() }
      assert(errors.isEmpty, s"vacuum thread failed: ${errors.peek()}")
      // the head snapshot must be fully readable: every referenced file alive
      assert(store.readSnapshot().count() == 1 + 5 * 20,
        "a concurrent sweep reclaimed files a commit references")
    }
  }

  test("merge-on-read DML composes with the sharded tier: DV commits, exact reads, zero driver file lists") {
    import org.apache.spark.sql.functions.col
    withThreshold(8, filesPerShard = 16) {
      val store = new TableStore(spark, graft.util.Scratch.dir("shard_mor"))
      store.commitBucketed(
        (1L to 2000L).map(k => (k, k * 10L)).toDF("k", "amt"), Seq("k"), 32)
      val m0 = store.manifest(0)
      assert(m0.isSharded, "32 bucket files over threshold 8 must shard")
      TableStore.driverMaterializations.set(0L)
      // deleteMor: DV-only commit — every shard inherited by reference
      val v1 = store.deleteMor(col("k") % 100L === 0L)
      val m1 = store.manifest(v1)
      assert(m1.isSharded && m1.hasDvs && m1.deletedRows == 20L)
      assert(m1.shards.map(_.path) == m0.shards.map(_.path),
        "MOR delete must inherit every manifest shard by reference")
      assert(store.readSnapshot().count() == 1980L)
      assert(store.readSnapshot().filter(col("k") === 100L).count() == 0L)
      assert(store.readSnapshot(0).count() == 2000L, "time travel pre-DV")
      // bucket-targeted read still applies the mask
      val b = Seq(100L).toDF("k")
        .select(TableStore.bucketExpr(Seq("k"), 32).as("b")).as[Long].head()
      assert(store.readBuckets(Seq(b)).filter(col("k") === 100L).count() == 0)
      // updateMor: DV + fresh images appended as a NEW shard, parents inherited
      val v2 = store.updateMor(col("k") <= 5L, Map("amt" -> (col("amt") + 1L)))
      val m2 = store.manifest(v2)
      assert(m2.isSharded &&
        m1.shards.map(_.path).forall(m2.shards.map(_.path).contains),
        "MOR update must inherit parent shards by reference")
      assert(m2.shards.size > m1.shards.size, "updated images join as a fresh shard")
      val back = store.readSnapshot()
      assert(back.count() == 1980L)
      assert(back.filter(col("k") <= 5L && col("amt") =!= col("k") * 10L + 1L)
        .count() == 0)
      // upsertMor: keyed CDC-shaped batch — mask + append, one commit
      val batch = Seq((3L, 999L, "PUT"), (2001L, 7L, "PUT"), (10L, 0L, "REMOVE"))
        .toDF("k", "amt", "op")
      val v3 = store.upsertMor(batch)
      val m3 = store.manifest(v3)
      assert(m3.isSharded)
      val now = store.readSnapshot()
      assert(now.filter(col("k") === 3L).select("amt").as[Long].head() == 999L)
      assert(now.filter(col("k") === 2001L).count() == 1L)
      assert(now.filter(col("k") === 10L).count() == 0L)
      assert(now.count() == 1980L) // +1 insert, -1 remove
      assert(TableStore.driverMaterializations.get() == 0L,
        "sharded MOR paths must never materialize a full file list on the driver")
      // purgeDeletes folds every DV on the sharded tier; content identical
      val expected = now.collect().toSet
      val v4 = store.purgeDeletes()
      val m4 = store.manifest(v4)
      assert(!m4.hasDvs, "purge must clear every DV")
      assert(store.readSnapshot().collect().toSet == expected)
      assert(TableStore.driverMaterializations.get() == 0L,
        "sharded purge must stay off the driver file-list path")
    }
  }

  test("changelog across sharded MOR commits emits DELETEs; rollback resurrects via symmetric DV diff") {
    import org.apache.spark.sql.functions.col
    withThreshold(4, filesPerShard = 16) {
      val store = new TableStore(spark, graft.util.Scratch.dir("shard_mor_cl"))
      store.commitBucketed(
        (1L to 500L).map(k => (k, s"v$k")).toDF("k", "v"), Seq("k"), 16)
      assert(store.manifest(0).isSharded)
      val v1 = store.deleteMor(col("k") <= 10L)
      val down = store.readChangelog(0L, v1).collect()
      assert(down.length == 10 && down.forall(_.getString(0) == "DELETE"))
      val v2 = store.rollbackTo(0L)
      val up = store.readChangelog(v1, v2).collect()
      assert(up.length == 10 && up.forall(_.getString(0) == "INSERT"),
        "rollback past a sharded MOR delete must emit the resurrected rows")
      assert(up.map(_.getLong(1)).toSet == (1L to 10L).toSet)
    }
  }

  test("tier transition proceeds with live DVs: a DV'd inline table shards on append and reads stay exact") {
    import org.apache.spark.sql.functions.col
    withThreshold(12, filesPerShard = 16) {
      val store = new TableStore(spark, graft.util.Scratch.dir("shard_dv_transition"))
      // one file per bucket: 8 files, under the inline threshold of 12
      store.commitBucketed(
        (1L to 400L).map(k => (k, k * 2L)).toDF("k", "n")
          .repartition(8, TableStore.bucketExpr(Seq("k"), 8)), Seq("k"), 8)
      assert(!store.manifest(0).isSharded)
      store.deleteMor(col("k") <= 40L)
      val expected = store.readSnapshot().collect().toSet
      // append pushes the file count past the threshold WHILE DVs are live:
      // previously held inline (sharded tier refused DVs) — now it shards
      val extra = (401L to 800L).map(k => (k, k * 2L)).toDF("k", "n")
      val v = store.commitAppend(extra)
      val m = store.manifest(v)
      assert(m.isSharded, "DV-carrying table must shard past the threshold")
      assert(m.hasDvs, "the transition must carry the DV refs forward")
      val back = store.readSnapshot()
      assert(back.count() == 360L + 400L)
      assert(back.filter(col("k") <= 40L).count() == 0L,
        "masked rows resurrected across the tier transition")
      assert(back.collect().toSet == expected ++ extra.collect().toSet)
      // and the MOR CDC loop keeps running on the now-sharded table
      val batch = Seq((1000L, 1L, 5L, "PUT"), (5L, 2L, 5L, "REMOVE"))
        .toDF("k", "n", "seq", "op")
      graft.streaming.StreamingOps.applyCdcBatchMor(
        batch, store, Seq("k"), 8)
      val m2 = store.manifest(store.currentVersion())
      assert(m2.isSharded && m2.version == v + 1,
        "sharded table must take the one-commit MOR CDC path")
      assert(store.readSnapshot().filter(col("k") === 1000L).count() == 1L)
      assert(store.readSnapshot().filter(col("k") === 5L).count() == 0L)
    }
  }

  test("50k-file metadata layer: shard round-trip and distributed pruning return only matching files") {
    // pure metadata-scale check: 50 000 synthetic file entries with
    // non-overlapping k-ranges; the shard layer must round-trip them and a
    // point predicate must come back with exactly one file
    val n = 50000
    val meta = spark.range(0, n).map { i =>
      val lo = i * 10
      val hi = lo + 9
      ManifestShards.FileMeta(
        s"file:/synthetic/data/snap-0-x/part-$i.parquet",
        i % 512, 4096L, 0L, 10L, 1,
        FileStats.colsToJson(Map("k" -> FileStats.ColStat(
          Some(lo.toString), Some(hi.toString), 0L))))
    }
    val dest = graft.util.Scratch.dir("shard_meta50k") + "/shards-v0"
    val refs = ManifestShards.write(spark, meta, dest, nShards = 7)
    assert(refs.size >= 7 && refs.map(_.files).sum == n)
    assert(ManifestShards.read(spark, refs.map(_.path)).count() == n)
    val m = TableStore.Manifest(0L, -1L,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", LongType))),
      dest, Nil, Nil, 0L, shards = refs)
    val store = new TableStore(spark, dest)
    val attr = AttributeReference("k", LongType)()
    val hits = store.pruneRefs(m, m.schema, Seq(EqualTo(attr, Literal(123456L))))
    assert(hits.map(_.path) == Seq(
      s"file:/synthetic/data/snap-0-x/part-${123456 / 10}.parquet"))
    assert(store.pruneRefs(m, m.schema,
      Seq(EqualTo(attr, Literal(-5L)))).isEmpty)
  }
}
