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
    // Default storage level (MEMORY_AND_DISK, deserialized) on purpose:
    // an r14 experiment with MEMORY_AND_DISK_SER — hoping to shrink big
    // checkpointed edge tables — OOM'd the sf10 label-propagation probe
    // at 48 GiB where the deserialized level passes at 24 GiB: RDD-cache
    // serialization of InternalRows goes through the session serializer
    // with per-task unroll buffers that SPIKE transient heap even though
    // the settled blocks are smaller. Deserialized UnsafeRows unroll
    // incrementally and evict to disk per-block under pressure.
    else df.localCheckpoint(eager)

  /** Release every RDD this session still holds persisted blocks for
    * (localCheckpoint / cache). Spark frees such blocks only when the
    * async ContextCleaner notices the RDD object itself was GC'd, so a
    * long-lived session running many queries (Bench, Verify, a notebook)
    * accumulates every past query's truncated-lineage blocks until the
    * heap fills — at 100× the graded scale (sf10 probe, r14) the
    * accumulation OOM'd a 24 GiB local[32] JVM after ~15 heavy queries.
    *
    * A harness utility for QUERY BOUNDARIES only — never call it inside
    * an operator: a lineage-truncated RDD cannot recompute, so releasing
    * blocks a still-live DataFrame will be asked for again would fail the
    * later action, not slow it down. Non-blocking (removal proceeds
    * asynchronously on the executors).
    *
    * SINGLE-THREADED-SESSION assumption: this releases every persisted
    * RDD in the session, so a concurrent query on a shared SparkSession
    * would lose its own truncated-lineage blocks and fail its later
    * actions. Bench/Verify drive queries strictly sequentially; a
    * multi-tenant driver must scope release to its own RDD ids instead.
    */
  def releaseAll(ss: org.apache.spark.sql.SparkSession): Unit =
    ss.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))

  /** Deterministic per-round block release for iteration loops that
    * materialize each round with their own action (Contiguity's
    * convergence checksum, k-means' eager centroid checkpoint). Once
    * round i is materialized its blocks are self-contained, so round
    * i−1's blocks are dead — but Spark won't reclaim them until the
    * ContextCleaner runs, and an N-round loop otherwise holds N copies
    * of the frontier. Usage per round:
    *
    * {{{
    *   rot.begin()                  // BEFORE creating the round's checkpoint
    *   val next = Checkpoints.truncate(step(e), eager = false)
    *   ...action that materializes next (and any use of the old round)...
    *   rot.rotate()                 // release the PREVIOUS round's blocks
    * }}}
    *
    * Tracks rounds by diffing `sparkContext.getPersistentRDDs` ids
    * (public API; `localCheckpoint` marks its RDD persisted at call time,
    * before materialization). The final round is never released — callers
    * build their result on it.
    *
    * SINGLE-THREADED-SESSION assumption: the diff is over the session's
    * GLOBAL persistent-RDD map, so an RDD persisted by a concurrent query
    * between begin() and rotate() would be mis-attributed to this loop
    * and unpersisted one round later — fatal for that query if its RDD is
    * lineage-truncated. Safe under the sequential Bench/Verify drivers; a
    * shared-session driver must not run iterative operators concurrently.
    */
  final class Rotation(ss: org.apache.spark.sql.SparkSession) {
    private val sc = ss.sparkContext
    private var prevIds: Set[Int] = Set.empty
    private var snap: Set[Int] = Set.empty

    def begin(): Unit = snap = sc.getPersistentRDDs.keySet.toSet

    def rotate(): Unit = {
      val cur = sc.getPersistentRDDs
      val mine = cur.keySet.toSet -- snap
      cur.iterator.filter(kv => prevIds(kv._1))
        .foreach(_._2.unpersist(blocking = false))
      prevIds = mine
    }
  }
}
