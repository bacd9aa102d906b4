package graft.util

import java.nio.file.{Files, Path}

/** Per-process scratch directories, recursively deleted at JVM exit.
  *
  * Query functions that materialize intermediate tables (snapshot loads,
  * partitioned sinks, catalog warehouses) previously leaked one temp dir per
  * run (VERDICT r3 hygiene): repeated bench/verify runs grew /tmp without
  * bound. Everything allocated here lives under a single per-process root
  * that a shutdown hook removes.
  */
object Scratch {

  private lazy val root: Path = {
    val p = Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p.toFile)))
    p
  }

  private def delete(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(delete)
    f.delete()
    ()
  }

  /** A fresh unique dir under the per-process root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  /** A STABLE per-process dir (same path on every call with the same name) —
    * for catalog warehouses whose path is pinned in session conf. */
  def stable(name: String): String = {
    val p = root.resolve(name)
    Files.createDirectories(p)
    p.toString
  }
}
