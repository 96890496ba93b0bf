package graft.ops

import org.apache.spark.sql.DataFrame

/** Write–Audit–Publish (io17): the production pattern for getting a
  * dataset into a consumed location without readers ever observing a
  * partial or unaudited state — write to a hidden staging directory,
  * run the caller's audit against the STAGED files (not the in-memory
  * lineage: the audit must see exactly the bytes readers will), then
  * atomically rename staging into place. The io14 dot-temp +
  * ATOMIC_MOVE discipline promoted from one file to a whole dataset.
  */
object Wap {

  /** Write `df` as parquet under a sibling staging directory of `dest`,
    * run `audit` on a fresh reader of the staged files, then publish by
    * same-filesystem rename.
    *
    * Guarantees: a failed audit (any exception) ABORTS the publish —
    * `dest` is untouched and the staging directory is kept for
    * inspection (its path rides the raised error). Publishing a NEW
    * `dest` is one atomic rename; REPLACING an existing `dest` has a
    * delete-then-rename window — the standard WAP deployment versions
    * dataset paths (…/table/v=N) and swaps a pointer instead, which
    * this primitive supports directly by always publishing new paths.
    */
  def writeAuditPublish(df: DataFrame, dest: String)
                       (audit: DataFrame => Unit): Unit = {
    val spark = df.sparkSession
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(destPath.getParent,
      "." + destPath.getName + ".staging-" +
        java.util.UUID.randomUUID.toString.take(8))
    df.write.mode("overwrite").parquet(staging.toString)
    try audit(spark.read.parquet(staging.toString))
    catch {
      case e: Throwable => throw new IllegalStateException(
        s"WAP audit failed — publish aborted, dest untouched, staging " +
          s"kept for inspection at $staging", e)
    }
    if (fs.exists(destPath)) fs.delete(destPath, true)
    require(fs.rename(staging, destPath),
      s"atomic publish rename failed: $staging -> $dest")
  }
}
