package graft.util

import java.io.File

/** Shared naming + staleness rule for the write-time index layouts
  * (LSH/IVF/PQ/SQ8/graph/HNSW/posting partition dirs under `target/`).
  * One copy of the two invariants every layout build needs:
  *
  *  - the layout path carries a full-source-path fingerprint, so two
  *    datasets with the same basename cannot collide;
  *  - the build reruns whenever the source parquet is newer than the
  *    layout's `_SUCCESS` marker — a regenerated dataset can never
  *    silently keep serving a stale index.
  */
object Layouts {

  private def src(d: String): File = new File(d).getCanonicalFile

  /** `target/<prefix>_<basename>_<fingerprint>` for dataset dir `d`.
    * `prefix` names the layout KIND and its schema generation (bump it
    * when the on-disk schema changes so old dirs are never misread). */
  def dir(prefix: String, d: String): File = {
    val s = src(d)
    val fp = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s.getPath))
    new File(s"target/${prefix}_${s.getName}_$fp").getAbsoluteFile
  }

  private def newestMtime(f: File): Long =
    if (f.isDirectory) (f.lastModified() +:
      Option(f.listFiles()).getOrElse(Array.empty).map(newestMtime).toSeq).max
    else f.lastModified()

  /** True when `layout` must be (re)built against `d`'s
    * `<table>.parquet`: no `_SUCCESS` marker yet, or the source is
    * newer than the marker. */
  def stale(layout: File, d: String, table: String): Boolean = {
    val marker = new File(layout, "_SUCCESS")
    !marker.exists() ||
      marker.lastModified() < newestMtime(new File(src(d), s"$table.parquet"))
  }
}
