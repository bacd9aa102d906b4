package graft.tools

import org.apache.spark.scheduler.SparkListener
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}

import scala.collection.mutable

/** Dev-only: SQL-execution-level wall-time attribution for named SparkEntry
  * queries.
  *
  * The lifecycle fixtures (sql_join_pyramid & co) spend their bench seconds
  * across dozens of Spark actions — commits, refreshes, require() probes, the
  * final query. This runs a query twice (min-of-2, like the bench) under a
  * listener that records every SQL execution's duration and call site
  * (the execution description IS the action call site, e.g. "parquet at
  * TableStore.scala:1319"), then prints the executions of the FASTER run
  * sorted by cost, an aggregation by site, and the driver-side gap (wall
  * time covered by no execution = planning, footer I/O, manifest JSON, FS
  * listing). Executions can overlap, so the gap is computed on the merged
  * execution-interval union, not the plain sum.
  */
object ProfJobs {
  private final case class ExecRec(id: Long, start: Long, var end: Long,
      site: String)

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
      val runs = (1 to 2).map { _ =>
        val execs = mutable.LinkedHashMap[Long, ExecRec]()
        val listener = new SparkListener {
          override def onOtherEvent(
              e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
            e match {
              case s: SparkListenerSQLExecutionStart =>
                execs.synchronized {
                  execs(s.executionId) =
                    ExecRec(s.executionId, s.time, -1L, s.description)
                }
              case s: SparkListenerSQLExecutionEnd =>
                execs.synchronized {
                  execs.get(s.executionId).foreach(_.end = s.time)
                }
              case _ => ()
            }
        }
        spark.sparkContext.addSparkListener(listener)
        // poor-man's driver profiler: sample the query thread every 10 ms,
        // histogram the topmost graft/planning frame (driver-gap decomposition)
        val mainThread = Thread.currentThread()
        val frameHist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
        @volatile var sampling = true
        val sampler = new Thread(() => {
          while (sampling) {
            val st = mainThread.getStackTrace
            val frame = st.find { e =>
              val c = e.getClassName
              c.startsWith("graft.") ||
                c.contains("catalyst.optimizer") ||
                c.contains("catalyst.analysis") ||
                c.contains("execution.datasources") ||
                c.contains("parquet.hadoop")
            }.map(e => s"${e.getClassName.split('.').last}.${e.getMethodName}")
              .getOrElse(st.headOption.map(e =>
                s"${e.getClassName.split('.').last}.${e.getMethodName}")
                .getOrElse("?"))
            frameHist.merge(frame, 1, (a, b) => a + b)
            Thread.sleep(10)
          }
        })
        sampler.setDaemon(true)
        sampler.start()
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        sampling = false
        // give the listener bus a beat so end events land before we snapshot
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(listener)
        spark.catalog.clearCache()
        (wall, rows, execs.values.toSeq, frameHist)
      }
      val (wall, rows, execs, frameHist) = runs.minBy(_._1)
      val done = execs.filter(_.end > 0)
      // merged-interval coverage: overlapping executions counted once
      val covered = {
        val iv = done.map(e => (e.start, e.end)).sortBy(_._1)
        var tot = 0L; var curS = Long.MinValue; var curE = Long.MinValue
        iv.foreach { case (s2, e2) =>
          if (s2 > curE) { tot += (curE - curS) max 0; curS = s2; curE = e2 }
          else if (e2 > curE) curE = e2
        }
        (tot + ((curE - curS) max 0)) / 1e3
      }
      println(f"\n===== $name wall=$wall%.2f s rows=$rows " +
        f"execs=${execs.size} covered=$covered%.2f s " +
        f"driver-gap=${wall - covered}%.2f s =====")
      done.sortBy(e => -(e.end - e.start)).take(30).foreach { e =>
        println(f"  ${(e.end - e.start) / 1e3}%7.3f s  exec=${e.id}%-4d ${e.site.take(100)}")
      }
      println("  -- driver thread samples (10ms) --")
      import scala.jdk.CollectionConverters._
      frameHist.asScala.toSeq.sortBy(-_._2).take(15).foreach {
        case (f, n) => println(f"  ${n * 0.01}%7.2f s  $f")
      }
      println("  -- by site --")
      done.groupBy(_.site).map { case (site, es) =>
        (es.map(e => (e.end - e.start) / 1e3).sum, es.size, site)
      }.toSeq.sortBy(-_._1).take(30).foreach { case (sec, n, site) =>
        println(f"  $sec%7.3f s  n=$n%-3d ${site.take(100)}")
      }
    }
    spark.stop()
  }
}
