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
    * `dest` is one atomic rename; REPLACING an existing `dest` renames
    * the old dataset ASIDE first and restores it if the publish rename
    * fails, so no failure mode destroys the previously published data
    * (the old delete-then-rename window is closed — a crash between the
    * two renames leaves the old dataset intact under a recoverable
    * `.replaced-*` sibling, never gone). The standard WAP deployment
    * still prefers versioned paths + a pointer swap — [[Versioned]]
    * (io18) builds exactly that on top of this primitive.
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
    if (fs.exists(destPath)) {
      val aside = new org.apache.hadoop.fs.Path(destPath.getParent,
        "." + destPath.getName + ".replaced-" +
          java.util.UUID.randomUUID.toString.take(8))
      require(fs.rename(destPath, aside),
        s"publish aborted before touching dest: could not move the " +
          s"existing $dest aside to $aside (staged data kept at $staging)")
      if (!fs.rename(staging, destPath)) {
        fs.rename(aside, destPath) // restore the previous dataset
        throw new IllegalStateException(
          s"atomic publish rename failed: $staging -> $dest (previous " +
            "dataset restored, staging kept)")
      }
      fs.delete(aside, true)
    } else require(fs.rename(staging, destPath),
      s"atomic publish rename failed: $staging -> $dest")
  }
}
