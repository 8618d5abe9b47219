package graft.sources

import org.apache.spark.sql.DataFrame

/** Lineage barrier for iterative operators (connected components,
  * pagerank, label propagation, the banded dedup family): materialize an
  * intermediate result and truncate its query lineage so per-round plans
  * stay O(1).
  *
  * Two modes:
  *
  *  - default: `localCheckpoint()` — executor-local blocks, no external
  *    storage, fastest. The blocks die with an executor, so on a real
  *    cluster a lost node forces whole-job recomputation.
  *  - reliable: set `spark.graft.checkpoint.dir` (SparkConf) or the
  *    `SPARK_GRAFT_CHECKPOINT_DIR` env var to a fault-tolerant path
  *    (HDFS/S3/...) and every barrier becomes a reliable `checkpoint()`
  *    persisted there — iterative state survives executor loss, the way
  *    the reference survives a PM crash through its persistent extent
  *    state (reference: versioning/BRM/extentmap.h:116).
  *
  * At 100 TB the reliable mode is the production setting: a 10-round
  * star-contraction over a trillion edges cannot afford to restart
  * because one of 1000 executors was preempted.
  */
object Checkpoints {

  /** Resolved checkpoint dir, if reliable mode is enabled. */
  def reliableDir(df: DataFrame): Option[String] =
    df.sparkSession.conf.getOption("spark.graft.checkpoint.dir")
      .orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR"))
      .filter(_.nonEmpty)

  /** Eagerly materialize `df` with truncated lineage — reliable
    * `checkpoint()` when a checkpoint dir is configured, else
    * `localCheckpoint()`.
    *
    * The guard keys on the CONTEXT's own state, not process-global
    * memory: `getCheckpointDir` returns the fs-qualified UUID subdir
    * `setCheckpointDir` created (never the raw configured path), so
    * "already set" is simply non-emptiness — one UUID subdir per
    * SparkContext, a fresh context after a restart gets configured
    * again, and a failed setCheckpointDir leaves nothing cached and is
    * retried. A dir already set on the context (by us or the caller) is
    * respected; changing the configured path mid-context is not
    * supported. Reliable-mode data retention is the operator's call
    * (or spark.cleaner.referenceTracking.cleanCheckpoints). */
  def barrier(df: DataFrame): DataFrame = reliableDir(df) match {
    case Some(dir) =>
      val sc = df.sparkSession.sparkContext
      sc.synchronized {
        sc.getCheckpointDir match {
          case None => sc.setCheckpointDir(dir)
          case Some(existing) if !existing.contains(dir) =>
            // the context's dir is a fs-qualified UUID SUBDIR of whatever
            // was configured first, so containment of the raw path is the
            // "same place" test; a mismatch means a caller changed the
            // configured dir mid-context (unsupported) or something else
            // set the context's dir first — warn rather than silently
            // checkpoint somewhere the caller didn't ask for
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"reliable barrier: SparkContext checkpoint dir is already " +
                s"'$existing'; configured '$dir' is NOT applied (changing " +
                "the checkpoint dir mid-context is unsupported)")
          case _ => ()
        }
      }
      df.checkpoint()
    case None => df.localCheckpoint()
  }

  /** `df.barrier()` sugar so call sites chain like `localCheckpoint`. */
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def barrier(): DataFrame = Checkpoints.barrier(df)
  }
}
