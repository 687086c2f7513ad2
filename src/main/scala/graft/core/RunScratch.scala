package graft.core

import scala.collection.mutable

/** Per-run scratch directories for operators that persist an index to
  * local disk mid-query (IVF build/append, the stored dedup index).
  *
  * Keying a scratch path on the input dir alone made the lifecycle rows
  * correct-but-not-parallel-safe: two concurrent Verify/Bench JVMs on the
  * same sfDir would build and append into the SAME directory, racing the
  * overwrite. Every JVM therefore gets a unique tag (pid + JVM-start
  * nanotime) mixed into the path — concurrent runs can no longer observe
  * each other's stores, while repeated invocations WITHIN one JVM (bench
  * cold/warm reps) still reuse one directory, which the build step
  * overwrites by contract.
  *
  * A shutdown hook removes every directory handed out, so repeated runs
  * don't accumulate dead indexes under the system temp dir.
  */
object RunScratch {
  private val tag: String =
    s"${ProcessHandle.current().pid()}_${java.lang.Long.toHexString(System.nanoTime())}"

  private val issued = mutable.Set.empty[String]

  private def rmTree(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(rmTree)
    f.delete(): Unit
  }

  sys.addShutdownHook {
    issued.synchronized { issued.toSeq }.foreach(p => rmTree(new java.io.File(p)))
  }

  /** A per-(prefix, input-dir) scratch path unique to this JVM. */
  def dir(prefix: String, inputDir: String): String = {
    val p = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"${prefix}_${Integer.toHexString(inputDir.hashCode)}_$tag").toString
    issued.synchronized { issued += p }
    p
  }
}
