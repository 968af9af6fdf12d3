package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session cache of source-table RELATIONS — lazy plans, never rows.
  *
  * `spark.read.parquet` re-runs driver-side file listing and footer
  * schema inference on every call; a full bench session calls the query
  * loaders ~700 times over the same immutable input files, so that fixed
  * cost is paid hundreds of times per session (r17, verdict item 9's
  * "fixed-overhead tail"). Caching the RESOLVED DataFrame per
  * (session, path) is exactly the behavior a catalog-registered table
  * gives: every action still scans the parquet files and computes from
  * scratch — a DataFrame is a plan, and nothing here persists data or
  * results — only the relation resolution (listing + schema) is reused.
  *
  * Keyed by (session, path): concurrent or successive sessions never
  * share state, and a session's entries become unreachable with it.
  */
object Tables {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def parquet(s: SparkSession, path: String): DataFrame =
    cache.computeIfAbsent((s, path), kv => kv._1.read.parquet(kv._2))
}
