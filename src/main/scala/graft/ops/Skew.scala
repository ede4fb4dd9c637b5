package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (100 TB concern: a hot join/group key melts one
  * task while the rest idle).
  *
  * First line of defense is AQE's skew-join splitting (on in
  * GraftSession). These helpers cover the cases AQE can't fix:
  * shuffle-free-side replication for joins (salting) and two-phase
  * aggregation for hot group keys.
  */
object Skew {

  private val SALT = "__graft_salt"

  /** Salted left equi-join for a skewed LEFT side: left rows get a
    * deterministic pseudo-random salt in [0, buckets); the (small) right
    * side is replicated `buckets`× with every salt value. The join key
    * becomes (keys..., salt), spreading each hot key over `buckets` tasks.
    * Result is row-identical to `Joins.leftJoin(left, right, keys)`.
    *
    * Salt = xxhash64 over all left columns — fully deterministic per ROW
    * CONTENT, which is the only retry-safe choice: a position- or
    * rand()-based salt changes on partial stage recompute, and a shuffle
    * keyed on a value that differs between the original and recomputed
    * map output silently loses/duplicates rows when reducers mix the two
    * (the SPARK-23207 hazard class). Known limitation: rows that are
    * bit-identical across ALL columns share a salt, so the degenerate
    * all-duplicate hot key still lands in one bucket — that shape is
    * AQE skew-split's job (on in GraftSession), not salting's. */
  def saltedLeftJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                     buckets: Int): DataFrame = {
    val salted = left.withColumn(SALT,
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(buckets))
        .cast("int"))
    val replicated = right.withColumn(SALT,
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ SALT, "left").drop(SALT)
  }

  /** Two-phase aggregation for skewed group keys: aggregate on
    * (keys, salt) first — spreading a hot key across `buckets` partial
    * groups — then re-aggregate to the final key. The caller supplies the
    * partial aggregates and how to merge them, e.g.
    * {{{
    * saltedAggregate(df, Seq("k"), 16,
    *   partial = Seq(sum($"v").as("s"), count(lit(1)).as("c")),
    *   merge   = Seq(sum($"s").as("s"), sum($"c").as("c")))
    * }}}
    * (Spark's hash aggregate already does map-side partial aggregation;
    * this helper matters when the DISTINCT variants or huge per-key state
    * defeat it.) */
  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int,
                      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    // content-only salt: deterministic under stage retry (see
    // saltedLeftJoin scaladoc); identical duplicate rows share a bucket
    val salted = df.withColumn(SALT,
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    salted.groupBy((keys :+ SALT).map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
