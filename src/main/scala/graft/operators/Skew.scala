package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (builder brief / SURVEY §7.2 step 11:
  * "salted skew keys"). AQE's skew-join splitting handles sort-merge
  * joins after the fact; explicit salting is the plan-level tool for the
  * two shapes AQE does not rewrite:
  *
  *  - a heavy hit key in an equi join against a small-but-not-
  *    broadcastable dimension ([[saltedJoin]]): the dimension is
  *    replicated `numSalts`× and the fact side salted deterministically,
  *    so one hot key's rows spread over `numSalts` reducers instead of
  *    serializing on one;
  *  - a heavy group key in an aggregation whose FINAL reducer is the
  *    bottleneck ([[saltedAgg]]): partials aggregate by (key, salt) —
  *    `numSalts`-way parallel for the hot key — then a tiny final pass
  *    merges `numSalts` partial rows per key. (Spark's hash aggregate
  *    already combines map-side; the salt matters when per-key partial
  *    state is large — collect-like aggs — or when post-combine row
  *    counts per key still dwarf one reducer.)
  *
  * Salting never changes results, only placement: the salt is an extra
  * equi-join/group column that every dimension row carries for all
  * values. Results are salt-invariant, so the DuckDB oracle for q44 is
  * the PLAIN join+group — the gate proves semantics preservation.
  */
object Skew {

  /** Deterministic salt in [0, numSalts) from row columns (Murmur3 —
    * only the distribution matters, never the values). */
  def saltCol(numSalts: Int, src: Seq[Column]): Column = {
    // numSalts < 1 would divide by zero (ANSI) or, on the dim side,
    // hand sequence() a lo > hi span — which Spark evaluates DESCENDING,
    // emitting bogus negative salts (same hazard class as the
    // Tiling.sliding guard). Fail fast instead.
    require(numSalts >= 1, s"numSalts must be >= 1, got $numSalts")
    pmod(hash(src: _*), lit(numSalts))
  }

  /** Skew-safe equi join on `keys`: the (small) `dim` side is exploded
    * to every salt, the fact side salted from `factSaltSrc` columns. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 numSalts: Int, factSaltSrc: Seq[Column]): DataFrame = {
    requireNoSaltCol(fact); requireNoSaltCol(dim)
    val f = fact.withColumn("_salt", saltCol(numSalts, factSaltSrc))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    f.join(d, keys :+ "_salt").drop("_salt")
  }

  /** The working column is `_salt`; an input already carrying one would
    * be silently overwritten then dropped — refuse instead. */
  private def requireNoSaltCol(df: DataFrame): Unit =
    require(!df.columns.contains("_salt"),
      "input already has a _salt column — rename it before salting")

  /** Two-phase salted aggregation: `partialAggs` run per (keys, salt),
    * `finalAggs` merge the partials per key. The caller supplies the
    * decomposition (sum→sum, count→sum of counts, max→max, decimal sums
    * stay decimal until the final cast so fp order cannot differ). */
  def saltedAgg(df: DataFrame, keys: Seq[String], numSalts: Int,
                saltSrc: Seq[Column], partialAggs: Seq[Column],
                finalAggs: Seq[Column]): DataFrame = {
    requireNoSaltCol(df)
    df.withColumn("_salt", saltCol(numSalts, saltSrc))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
