package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Similarity search over an embedding column (`array<float>`).
  *
  * Three tiers, by scale:
  * - [[bruteTopK]]: exact top-k for a SMALL query set against the full
  *   corpus — a broadcast join (query side broadcast), linear in corpus.
  * - [[nearDupByBlock]]: pairwise cosine restricted to a blocking key
  *   (label / shard / cluster id) — equi-join, quadratic only in block size.
  * - [[lshPairs]]: random-hyperplane LSH — signature is linear scalar math,
  *   candidates come from an equi-join on the bucket id, exact cosine only
  *   on candidates. This is the 100 TB path: no cartesian anywhere.
  *
  * All dot products fold left-to-right in double precision via
  * `aggregate(zip_with(...))` — bit-identical to the DuckDB oracle's
  * `list_reduce(list_transform(...))`.
  */
object Similarity {

  /** Exact top-k neighbours for each query vector (queries = a filtered
    * subset of the corpus). Broadcast the small query side; rank with a
    * window over (similarity desc, vec_id) for a deterministic total order.
    */
  def bruteTopK(vecs: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = vecs.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = vecs.select(col("vec_id"), col("embedding"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Portable.cosine(col("q_emb"), col("embedding")).as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Near-duplicate vector pairs within a blocking key (exact within block).
    * The blocking column makes this an equi-join: shuffle partitions by
    * block, never all-pairs across blocks.
    */
  def nearDupByBlock(vecs: DataFrame, blockCol: String, minCosine: Double): DataFrame = {
    val a = vecs.select(col(blockCol).as("block"),
      col("vec_id").as("a_id"), col("embedding").as("emb_a"))
    val b = vecs.select(col(blockCol).as("block"),
      col("vec_id").as("b_id"), col("embedding").as("emb_b"))
    a.join(b, "block")
      .filter(col("a_id") < col("b_id"))
      .select(col("block"), col("a_id"), col("b_id"),
        Portable.cosine(col("emb_a"), col("emb_b")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** Random-hyperplane LSH signature: `numPlanes` pseudo-random ±1
    * hyperplanes derived from the portable hash (plane p, dim d -> sign of
    * hash32(p*97+d) bit 0), signature bit p = (dot(v, plane_p) >= 0).
    * Everything is derivable in SQL, so the oracle can replay it exactly.
    */
  def lshBucket(vecs: DataFrame, numPlanes: Int, dim: Int): DataFrame = {
    // plane signs as a literal matrix — computed once at plan time
    val signs: Seq[Seq[Int]] = (0 until numPlanes).map { p =>
      (0 until dim).map { d =>
        // parity of the portable 32-bit hash of "p*97+d"
        val md5hex = java.security.MessageDigest.getInstance("MD5")
          .digest(String.valueOf(p * 97 + d).getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        if ((java.lang.Long.parseLong(md5hex, 16) & 1L) == 1L) 1 else -1
      }
    }
    val bucket = (0 until numPlanes).map { p =>
      val dot = (0 until dim).map { d =>
        element_at(col("embedding"), d + 1).cast("double") * signs(p)(d)
      }.reduce(_ + _)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce(_ + _)
    vecs.withColumn("bucket", bucket)
  }

  /** LSH candidate pairs + exact cosine verify (the ANN scale path). */
  def lshPairs(vecs: DataFrame, numPlanes: Int, dim: Int, minCosine: Double): DataFrame = {
    val sig = lshBucket(vecs, numPlanes, dim)
    val a = sig.select(col("bucket"), col("vec_id").as("a_id"), col("embedding").as("emb_a"))
    val b = sig.select(col("bucket"), col("vec_id").as("b_id"), col("embedding").as("emb_b"))
    a.join(b, "bucket")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        Portable.cosine(col("emb_a"), col("emb_b")).as("cosine"))
      .distinct()
      .filter(col("cosine") >= minCosine)
  }
}
