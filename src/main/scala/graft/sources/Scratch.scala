package graft.sources

import org.apache.spark.sql.SparkSession

/** Scratch-artifact hygiene for app-id-suffixed paths and tables.
  *
  * App-id suffixes keep two concurrent drivers (a bench sweep next to a
  * test run) from interleaving overwrite-and-read on one path — but they
  * turn in-place overwrites into one leaked artifact per run, and a
  * long-lived workspace accumulates data-sized parquet copies until the
  * disk fills. [[sweepStale]] reclaims them with an AGE GATE instead of a
  * liveness check, backed by two defenses for the long-session edge (a
  * session outliving the gate would otherwise see a concurrent driver
  * delete its start-of-session artifact mid-run):
  *   - the gate (6 h) sits well above the longest session this harness
  *     runs (a full bench sweep is tens of minutes);
  *   - `exclude` skips the CALLER'S OWN artifact names regardless of age,
  *     so a driver can never have its live artifact swept by its own
  *     hygiene pass, and each query re-WRITES (refreshing mtime) before it
  *     reads — within one query the artifact is always minutes old.
  * Anything younger than the gate is left alone even if its owner already
  * exited. Best-effort — a failed delete is ignored, the next run retries.
  */
object Scratch {

  def sweepStale(dir: String, prefix: String,
                 maxAgeMs: Long = 6L * 60 * 60 * 1000,
                 exclude: Set[String] = Set.empty): Unit = {
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val kids = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    kids.filter(f => f.getName.startsWith(prefix) && f.lastModified() < cutoff &&
        !exclude.contains(f.getName))
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
