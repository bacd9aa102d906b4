package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.store.TableStore

/** Snapshot store: commit/read/time-travel/compaction/GC/CAS
  * (SURVEY §5.2.3d + §4.1 manifest-CAS analog of the reference Lambda's
  * PolicyHashCondition). */
class TableStoreSpec extends SparkSuite {
  import spark.implicits._

  private def freshStore() =
    new TableStore(spark, Files.createTempDirectory("graft_ts_spec").toString)

  test("commit + read returns identical content and schema") {
    val store = freshStore()
    val li = Tables.load(spark, sfDir, "lineitem")
    store.commitSnapshot(li)
    val back = store.readSnapshot()
    assert(back.schema.fieldNames.toSeq == li.schema.fieldNames.toSeq)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).count() == 0)
  }

  test("partitioned commit restores declared column order and types") {
    val store = freshStore()
    val o = Tables.load(spark, sfDir, "orders")
    store.commitSnapshot(o, partitionBy = Seq("o_orderstatus"))
    val back = store.readSnapshot()
    assert(back.schema.fieldNames.toSeq == o.schema.fieldNames.toSeq)
    assert(back.exceptAll(o).count() == 0)
  }

  test("time travel reads older snapshots; schema history is versioned") {
    val store = freshStore()
    val v0 = store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    val v1 = store.commitSnapshot(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    assert(v0 == 0 && v1 == 1)
    assert(store.readSnapshot(v0).count() == 1)
    assert(store.readSnapshot(v1).count() == 2)
    assert(store.schemaHistory().map(_._1) == Seq(0L, 1L))
  }

  test("compaction preserves the row multiset and reduces files") {
    val store = freshStore()
    val li = Tables.load(spark, sfDir, "lineitem").repartition(16)
    store.commitSnapshot(li)
    val before = store.manifest(store.currentVersion()).files.size
    store.compact(targetFiles = 1)
    val after = store.manifest(store.currentVersion()).files.size
    assert(before > after && after == 1)
    assert(store.readSnapshot().exceptAll(li).count() == 0)
    assert(store.readSnapshot().count() == li.count())
  }

  test("vacuum removes unreferenced snapshot dirs, keeps referenced ones") {
    val store = freshStore()
    store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    store.commitSnapshot(Seq((2L, "b")).toDF("k", "v"))
    val deleted = store.vacuum(keepSnapshots = 1)
    assert(deleted.size == 1 && deleted.head.contains("snap-0"))
    assert(store.readSnapshot().count() == 1) // current still readable
  }

  test("time-based vacuum drops only snapshots older than the retention") {
    val store = freshStore()
    store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    Thread.sleep(30)
    store.commitSnapshot(Seq((2L, "b")).toDF("k", "v"))
    val committedAt0 = store.manifest(0).committedAtMs
    // retention shorter than snapshot-0's age, longer than snapshot-1's
    val now = store.manifest(1).committedAtMs + 5
    val deleted = store.vacuumOlderThan(now - committedAt0 - 10, nowMs = now)
    assert(deleted.size == 1 && deleted.head.contains("snap-0"))
    assert(store.readSnapshot().count() == 1)
    // nothing old enough anymore -> no-op
    assert(store.vacuumOlderThan(1000000L, nowMs = now).isEmpty)
  }

  test("versionAsOfTimestamp picks the latest snapshot at or before ts") {
    val store = freshStore()
    store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    Thread.sleep(30)
    store.commitSnapshot(Seq((2L, "b")).toDF("k", "v"))
    val t0 = store.manifest(0).committedAtMs
    val t1 = store.manifest(1).committedAtMs
    assert(store.versionAsOfTimestamp(t0) == Some(0L))
    assert(store.versionAsOfTimestamp(t1 + 1000) == Some(1L))
    assert(store.versionAsOfTimestamp(t0 - 1000) == None)
  }

  test("vacuum removes manifests too: history and resolution skip GC'd versions") {
    val store = freshStore()
    store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    Thread.sleep(30)
    store.commitSnapshot(Seq((2L, "b")).toDF("k", "v"))
    store.commitSnapshot(Seq((3L, "c")).toDF("k", "v"))
    val t0 = store.manifest(0).committedAtMs
    store.vacuum(keepSnapshots = 1)
    // GC'd versions are gone from every resolution surface, not just the data
    assert(store.existingVersions() == Seq(2L))
    assert(store.schemaHistory().map(_._1) == Seq(2L))
    assert(store.versionAsOfTimestamp(t0).isEmpty)
    val e = intercept[IllegalArgumentException](store.readSnapshot(0))
    assert(e.getMessage.contains("vacuumed or never committed"))
    assert(store.readSnapshot().count() == 1)
  }

  test("racing writers: losers retry, all committed data stays intact") {
    val store = freshStore()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { t =>
      new Thread(() => {
        try {
          for (i <- 0 until 5) {
            var done = false
            while (!done) {
              try { store.commitSnapshot(Seq((t.toLong, i.toLong)).toDF("w", "i")); done = true }
              catch { case _: IllegalStateException => /* lost the CAS; retry */ }
            }
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"unexpected: ${errors.peek()}")
    assert(store.currentVersion() == 9L)
    // every committed snapshot readable: no loser overwrote a winner's files
    store.existingVersions().foreach(v => assert(store.readSnapshot(v).count() == 1))
    // losers cleaned their orphaned staging dirs: one data dir per commit
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val dataDirs = fs.listStatus(new org.apache.hadoop.fs.Path(store.root, "data"))
    assert(dataDirs.length == 10, s"expected 10 data dirs, found ${dataDirs.length}")
  }

  test("CAS: stale expected parent is rejected") {
    val store = freshStore()
    store.commitSnapshot(Seq((1L, "a")).toDF("k", "v"))
    val e = intercept[IllegalStateException](
      store.commitSnapshot(Seq((2L, "b")).toDF("k", "v"),
        expectedParent = Some(5L)))
    assert(e.getMessage.contains("CAS"))
  }

  test("empty table read fails with a descriptive error") {
    val store = freshStore()
    val e = intercept[IllegalArgumentException](store.readSnapshot())
    assert(e.getMessage.contains("no committed snapshot"))
  }
}
