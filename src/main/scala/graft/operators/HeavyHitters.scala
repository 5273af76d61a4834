package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAgg

/** Two-pass exact heavy hitters (L51): Misra-Gries candidate sketch,
  * then an exact confirm count over the candidates only. Output is the
  * EXACT set of keys with count ≥ ceil(N / minFracDen) — the sketch
  * never decides membership, it only bounds what the confirm pass has
  * to count.
  *
  * Why not a plain groupBy-having: on a 100 TB corpus the key domain
  * (tokens, URLs, n-grams) has billions of distinct values — a full
  * groupBy shuffles the entire key universe to find the handful above
  * threshold. Here:
  *  - pass 1 is a GLOBAL aggregate whose partial buffers are
  *    capacity-bounded (the only thing shuffled is one ≤capacity-entry
  *    sketch per map task, merged on one reducer — the scalar-merge
  *    shape, exempt by construction from the SinglePartition sweep);
  *  - pass 2 broadcast-semi-joins the ≤capacity candidate keys into the
  *    scan and aggregates ONLY matching rows — the shuffle carries
  *    partials for ≤capacity keys.
  *
  * Correctness requires capacity + 1 > minFracDen (the MG guarantee:
  * every key with count > N/(capacity+1) survives the sketch; the
  * threshold N/minFracDen must sit above that floor) — enforced.
  */
object HeavyHitters {

  /** @param items      one row per occurrence
    * @param key        string key column
    * @param capacity   sketch size (candidates bound)
    * @param minFracDen threshold denominator: keep keys whose count*minFracDen ≥ N
    * @return (token, n_occ) — exact counts, exact membership
    */
  def heavyHitters(items: DataFrame, key: Column, capacity: Int,
                   minFracDen: Long): DataFrame = {
    require(capacity + 1 > minFracDen,
      s"capacity $capacity too small for 1/$minFracDen threshold: " +
        s"the MG guarantee needs capacity+1 > minFracDen")
    val ks = items.select(key.as("k"))
    val cand = ks.agg(MisraGriesAgg.misraGries(col("k"), capacity).as("s"))
      .select(col("s.n_total").as("n_total"),
        explode(col("s.keys")).as("k"))
    ks.join(broadcast(cand), "k")
      .groupBy(col("k"), col("n_total"))
      .agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") * minFracDen >= col("n_total"))
      .select(col("k").as("token"), col("n_occ"))
  }
}
