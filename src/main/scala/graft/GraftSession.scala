package graft

import org.apache.spark.sql.SparkSession

import graft.functions.Registry

/** Session factory for the graft engine.
  *
  * The reference engine's only execution knob is a process-global batch size
  * (reference: vinum/__init__.py:52-62); on Spark the equivalents are shuffle
  * partitioning, adaptive execution and codegen, configured here once.
  *
  * Scale notes (100 TB design): shuffle partitions are set low for local[32]
  * testing; on a real cluster the AQE coalescing below makes the initial
  * number a ceiling, not a tuning burden. All graft operators avoid
  * driver-side collection and express work as Catalyst plans so the same
  * code runs unchanged on a 1000-executor cluster.
  */
object GraftSession {

  def builder(master: String = "local[*]"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      // Static conf (read once, before the first codegen): the default
      // 100-entry generated-class cache thrashes on plan-diverse
      // workloads (this suite's 420 queries produce a few thousand
      // codegen units), recompiling every fragment on every revisit.
      // Workload-sized, not host-sized; ~8k small classes of driver
      // metaspace. Overridable for A/B via SPARK_GRAFT_CODEGEN_CACHE.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8000"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // report per-bucket sort order from bucketed scans (io16/Pq write
      // bucketBy+sortBy with one file per bucket): lets a co-located
      // merge join skip BOTH its Exchange and its Sort. Off by default
      // upstream only because the check lists files at planning time —
      // the right trade wherever a sorted bucketed layout is the point
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")

  /** Get or create a session with all graft SQL functions registered. */
  def getOrCreate(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    Registry.registerAll(spark)
    spark
  }
}
