package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-pair association rules (Agrawal & Srikant 1994, A-priori —
  * the market-basket classic): which items co-occur in the same basket
  * more than chance — co-purchases, co-edited files, co-queried tables,
  * co-occurring error codes. For each surviving pair, support plus the
  * two directed rules' confidence and the symmetric lift.
  *
  * Scale shape is the A-priori downward-closure prune made physical:
  * items below `minItemSupport` are cut BEFORE the pair join (a pair
  * can't be frequent if a member isn't), so the basket-keyed self-equi-
  * join runs over frequent items only — fan-out per basket is
  * (frequent items per basket choose 2), not (basket size choose 2), and
  * the hot-item skew is exactly what the support cut removes. One
  * (a,b)-keyed hash agg counts pairs; item supports join back
  * (item-domain-sized, broadcastable); the basket total is a 1-row
  * broadcast. No cartesian, no window.
  *
  * Determinism: supports are exact longs; confidence = n_ab/n_a and
  * lift = n_ab·B/(n_a·n_b) are each ONE double division of exact longs
  * (log-free, the collocations discipline).
  */
object Association {

  /** @param baskets (basketCol, itemCol) rows; duplicates tolerated
    *                (de-duplicated here — presence, not multiplicity)
    */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
                minItemSupport: Long, minPairSupport: Long): DataFrame = {
    // b feeds the support agg, both sides of the pair self-join (via
    // freq) and the basket total; supp feeds the semi-join and two
    // broadcasts — untruncated, every broadcast job re-ran the whole
    // distinct/agg derivation tree (r17). One materialization each.
    val b = graft.util.Checkpoints.truncate(
      baskets.select(col(basketCol).as("bid"), col(itemCol).as("item"))
        .distinct(), eager = false)
    val supp = graft.util.Checkpoints.truncate(
      b.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
        .filter(col("n_item") >= minItemSupport), eager = false)
    val freq = b.join(supp.select(col("item")), Seq("item"), "left_semi")
    val pairs = freq.select(col("bid"), col("item").as("a"))
      .join(freq.select(col("bid"), col("item").as("b")), Seq("bid"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairSupport)
    val total = b.select(col("bid")).distinct().agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(broadcast(supp.select(col("item").as("a"), col("n_item").as("n_a"))),
        Seq("a"))
      .join(broadcast(supp.select(col("item").as("b"), col("n_item").as("n_b"))),
        Seq("b"))
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("conf_a_to_b"),
        (col("n_ab").cast("double") / col("n_b").cast("double"))
          .as("conf_b_to_a"),
        ((col("n_ab") * col("n_baskets")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }
}
