package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: merge-on-read DELETE vs copy-on-write DELETE on a
  * replicated lineitem (evidence for NOTES.md / SCALE.md).
  *
  * Reports, for the same selective delete on the same bucketed table:
  *   - COW (SQL deleteWhere path): wall time + bytes written (rewritten
  *     bucket files)
  *   - MOR (deleteMor): wall time + bytes written (the DV parquet)
  *   - read-back wall time pre-delete / under DV / post-purge (the MOR
  *     read tax and its removal)
  */
object DvStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("GRAFT_DV_REPLICATE", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def newBytes(st: graft.store.TableStore, v0: Long, v1: Long): Long = {
      val m0 = st.manifest(v0); val m1 = st.manifest(v1)
      val old = m0.inlineFiles.toSet
      m1.inlineFiles.filterNot(old).map(f => m1.inlineStats(f).bytes).sum +
        m1.dvRefs.filterNot(m0.dvRefs.toSet).map(_.bytes).sum
    }

    val li0 = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("l_quantity"), col("l_returnflag"))
    val maxKey = li0.agg(max("l_orderkey")).head().getLong(0) + 1
    val li = (0 until replicate).map(i =>
      li0.withColumn("l_orderkey", col("l_orderkey") + lit(i * maxKey)))
      .reduce(_ union _)

    // the delete target: one order's rows (a point delete on the bucket key)
    val victim = maxKey / 2 - 1

    def freshTable(): graft.store.TableStore = {
      val st = new graft.store.TableStore(spark, graft.util.Scratch.dir("dvstats"))
      st.commitBucketed(li, Seq("l_orderkey"), 32)
      st
    }

    // --- COW: targeted bucket rewrite (what SQL DELETE does by default)
    val cow = freshTable()
    val rows = cow.readSnapshot().count()
    val (_, tCowRead) = timed(cow.readSnapshot().count())
    val v0 = cow.currentVersion()
    // deleteWhere-equivalent: rewrite the victim's bucket without its rows
    val (vCow, tCow2) = timed {
      val touched = {
        import spark.implicits._
        Seq(victim).toDF("l_orderkey")
          .select(graft.store.TableStore.bucketExpr(Seq("l_orderkey"), 32)
            .as("b")).as[Long].head()
      }
      cow.commitIncremental(
        cow.readBuckets(Seq(touched)).filter(col("l_orderkey") =!= victim),
        Seq(touched), expectedParent = Some(v0))
    }
    val cowBytes = newBytes(cow, v0, vCow)

    // --- MOR: delete vector
    val mor = freshTable()
    val mv0 = mor.currentVersion()
    val (mv1, tMor) = timed(mor.deleteMor(col("l_orderkey") === victim))
    val morBytes = newBytes(mor, mv0, mv1)
    val (_, tDvRead) = timed(mor.readSnapshot().count())
    val (_, tPurge) = timed(mor.purgeDeletes())
    val (_, tCleanRead) = timed(mor.readSnapshot().count())

    println(f"[dvstats] table: $rows%,d rows x 32 buckets (replicate=$replicate)")
    println(f"[dvstats] COW delete:  $tCow2%.2f s, $cowBytes%,d bytes written")
    println(f"[dvstats] MOR delete:  $tMor%.2f s, $morBytes%,d bytes written " +
      f"(${cowBytes.toDouble / math.max(morBytes, 1)}%.0fx less)")
    println(f"[dvstats] read: clean $tCowRead%.2f s | under DV $tDvRead%.2f s " +
      f"| purge $tPurge%.2f s | post-purge $tCleanRead%.2f s")
    require(cow.readSnapshot().count() == mor.readSnapshot().count(),
      "COW and MOR deletes diverged")

    // --- MOR on the SHARDED manifest tier (round 8): the same point delete
    // with the metadata layer forced onto parquet shards — write volume and
    // read tax must survive the tier transition
    spark.conf.set("spark.graft.manifest.inlineThreshold", "8")
    try {
      val sh = freshTable()
      val sm0 = sh.manifest(sh.currentVersion())
      require(sm0.isSharded, "expected the forced tier transition")
      val (sv1, tShMor) = timed(sh.deleteMor(col("l_orderkey") === victim))
      val sm1 = sh.manifest(sv1)
      val shMorBytes =
        sm1.dvRefs.filterNot(sm0.dvRefs.toSet).map(_.bytes).sum
      require(sm1.shards.map(_.path) == sm0.shards.map(_.path),
        "sharded MOR delete must inherit every shard by reference")
      val (_, tShDvRead) = timed(sh.readSnapshot().count())
      val (_, tShPurge) = timed(sh.purgeDeletes())
      val (_, tShClean) = timed(sh.readSnapshot().count())
      println(f"[dvstats] SHARDED MOR delete: $tShMor%.2f s, " +
        f"$shMorBytes%,d bytes written " +
        f"(${cowBytes.toDouble / math.max(shMorBytes, 1)}%.0fx less than COW)")
      println(f"[dvstats] SHARDED read: under DV $tShDvRead%.2f s | " +
        f"purge $tShPurge%.2f s | post-purge $tShClean%.2f s")
      require(sh.readSnapshot().count() == mor.readSnapshot().count(),
        "sharded MOR delete diverged")
    } finally spark.conf.unset("spark.graft.manifest.inlineThreshold")
    spark.stop()
  }
}
