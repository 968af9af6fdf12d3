package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (PageRank, star-contraction
  * CC, k-means, BPE): every round references its previous round's output
  * more than once, so an untruncated plan doubles per iteration.
  *
  * `localCheckpoint` stores blocks on executors — fine on local[n], but on
  * a real cluster a single executor loss makes the truncated lineage
  * unrecoverable and kills a 100 TB job mid-iteration. So: when the
  * session has a reliable checkpoint directory configured
  * (`sparkContext.setCheckpointDir`, typically HDFS/S3), use the durable
  * `checkpoint()`; otherwise fall back to `localCheckpoint()`. Callers opt
  * in to durability purely through Spark's own session-level setting — no
  * per-operator flags to thread.
  */
object Checkpoints {

  /** @param eager materialize now (default) vs on first use — iterations
    *              whose next action materializes the same blocks anyway
    *              (Contiguity's convergence checksum) pass false to avoid
    *              a separate job per round
    */
  def truncate(df: DataFrame, eager: Boolean = true): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager)
    else df.localCheckpoint(eager)
}
