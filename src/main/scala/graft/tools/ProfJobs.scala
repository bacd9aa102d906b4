package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev-only: job-level wall-time attribution for named SparkEntry queries.
  *
  * The lifecycle fixtures (sql_join_pyramid & co) spend their bench seconds
  * across dozens of Spark jobs — commits, refreshes, require() probes, the
  * final query. This runs a query twice (min-of-2, like the bench) under a
  * listener that records every job's duration and call site, then prints the
  * jobs of the FASTER run sorted by cost plus the driver-side gap (wall time
  * not covered by any job = planning / footer I/O / manifest JSON).
  */
object ProfJobs {
  private final case class JobRec(id: Int, start: Long, var end: Long,
      site: String, desc: String)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Tables.names.foreach(t =>
      graft.Tables.load(spark, sfDir, t).limit(1).count())

    args.foreach { name =>
      val runs = (1 to 2).map { i =>
        val jobs = mutable.LinkedHashMap[Int, JobRec]()
        val listener = new SparkListener {
          override def onJobStart(j: SparkListenerJobStart): Unit = {
            val site = Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse("?")
            val desc = Option(j.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse("")
            jobs.synchronized {
              jobs(j.jobId) = JobRec(j.jobId, j.time, -1L, site, desc)
            }
          }
          override def onJobEnd(j: SparkListenerJobEnd): Unit =
            jobs.synchronized { jobs.get(j.jobId).foreach(_.end = j.time) }
        }
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.removeSparkListener(listener)
        spark.catalog.clearCache()
        (wall, rows, jobs.values.toSeq)
      }
      val (wall, rows, jobs) = runs.minBy(_._1)
      val done = jobs.filter(_.end > 0)
      val jobSec = done.map(j => (j.end - j.start) / 1e3).sum
      println(f"\n===== $name wall=$wall%.2f s rows=$rows jobs=${jobs.size} " +
        f"jobtime=$jobSec%.2f s driver-gap=${wall - jobSec}%.2f s =====")
      done.sortBy(j => -(j.end - j.start)).take(40).foreach { j =>
        println(f"  ${(j.end - j.start) / 1e3}%7.3f s  job=${j.id}%-4d " +
          s"${j.site}  ${j.desc.take(80)}")
      }
    }
    spark.stop()
  }
}
