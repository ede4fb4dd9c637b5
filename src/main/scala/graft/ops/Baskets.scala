package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence — the A-Priori first pass (Agrawal &
  * Srikant 1994's candidate-pair stage): which item pairs appear together
  * in more baskets than chance. The corpus-curation reading: co-citation
  * / co-click pairs for related-item retrieval, feature co-occurrence
  * for redundancy pruning.
  *
  * Outputs per surviving pair: `support` (baskets containing both) and
  * `lift_micros` = ⌊support · n_baskets · 1e6 / (s_a · s_b)⌋ — integer
  * micros (the determinism-toolbox move), > 1e6 means the pair
  * co-occurs MORE than independence predicts.
  *
  * Scale shape: baskets dedupe to (basket, item) once; the pair
  * generation is ONE self-equi-join on the basket key — fan-out bounded
  * by basket SIZE squared, never corpus-quadratic (the TPC-H basket is
  * ≤ 7 lines; a retail basket tens — if baskets can be huge, cap them
  * first, the standard A-Priori move). Pair counting is one combinable
  * aggregation; item supports and the basket count are tiny aggregates
  * broadcast back (the 1-row crossJoin is a broadcast, q112 precedent).
  * `minSupport` prunes BEFORE the stats joins so the long tail of
  * support-1 pairs (97% of the mass on the testdata) never reaches
  * them. */
object Baskets {

  def coPairs(df: DataFrame, basketCol: String, itemCol: String,
              minSupport: Long): DataFrame = {
    val b = df.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .filter(col("it").isNotNull && col("bk").isNotNull)
      .distinct()
    val nBaskets = b.agg(count_distinct(col("bk")).as("n_baskets"))
    val supp = b.groupBy(col("it")).agg(count(lit(1)).as("s"))
    val a = b.select(col("bk"), col("it").as("item_a"))
    val c = b.select(col("bk"), col("it").as("item_b"))
    val pairs = a.join(c, Seq("bk"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairs
      .join(broadcast(supp.select(col("it").as("item_a"), col("s").as("sa"))),
        "item_a")
      .join(broadcast(supp.select(col("it").as("item_b"), col("s").as("sb"))),
        "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("support"),
        expr("support * n_baskets * 1000000L div (sa * sb)").as("lift_micros"))
  }
}
