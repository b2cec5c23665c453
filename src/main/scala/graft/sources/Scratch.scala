package graft.sources

import org.apache.spark.sql.SparkSession

/** Scratch-artifact hygiene for app-id-suffixed paths and tables.
  *
  * App-id suffixes keep two concurrent drivers (a bench sweep next to a
  * test run) from interleaving overwrite-and-read on one path — but they
  * turn in-place overwrites into one leaked artifact per run, and a
  * long-lived workspace accumulates data-sized parquet copies until the
  * disk fills. [[sweepStale]] reclaims them with an AGE GATE instead of a
  * liveness check: a concurrent driver's artifacts are necessarily recent
  * (it wrote them this run), so anything older than `maxAgeMs` is dead by
  * construction and safe to delete; anything younger is left alone even if
  * its owner already exited. Best-effort — a failed delete is ignored, the
  * next run retries.
  */
object Scratch {

  def sweepStale(dir: String, prefix: String,
                 maxAgeMs: Long = 2L * 60 * 60 * 1000): Unit = {
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val kids = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    kids.filter(f => f.getName.startsWith(prefix) && f.lastModified() < cutoff)
      .foreach(deleteRecursively)
  }

  /** The session's warehouse directory as a local path (managed scratch
    * tables live there as plain directories once their session is gone). */
  def warehouseDir(s: SparkSession): String =
    s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
