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

  /** L77 — Count-Min sketch frequency audit: build a depth×width CMS
    * over the key stream (row j hashes with salt j), then report, for
    * the exact top-`auditK` keys, the true count next to the CMS
    * estimate (min over the depth rows) and the overestimate — the
    * measurement that sizes a production CMS (width vs error) before
    * it replaces exact counting in a 100 TB pass. CMS estimates are
    * deterministic given the hash family ([[graft.functions.TextFns.hash60]]
    * with per-row salts), so the whole audit is oracle-exact; the CMS
    * guarantee est ≥ true holds by construction.
    *
    * 100 TB shape: the counter build is ONE (row, bucket)-keyed
    * map-combined aggregate — each occurrence expands to `depth` rows,
    * but the exchange carries ≤ depth·width counter partials per task
    * (the counter table is depth·width rows TOTAL, by construction);
    * the audit join broadcasts the counter table onto the ≤ auditK
    * candidate frame. The exact top-K pass exists only for the audit
    * and is cut by TakeOrderedAndProject (it executes inside the
    * eagerly-pinned checkpoint subplan). */
  def countMinAudit(items: DataFrame, key: Column, depth: Int, width: Int,
                    auditK: Int): DataFrame = {
    import graft.functions.TextFns
    require(depth >= 1 && width >= 1, s"bad CMS geometry $depth x $width")
    val ks = items.select(key.as("k"))
    // Both small frames are consumed once PER DEPTH ROW by the audit
    // join chain below; unpinned, every consumer re-scans the key
    // stream (depth+1 corpus scans — seen in the plan). Checkpoint
    // costs depth·width + auditK rows.
    val counters = ks
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"), col("k"))
      .select(col("j"),
        pmod(TextFns.hash60(concat(col("j").cast("string"), lit("_"),
          col("k"))), lit(width.toLong)).as("bucket"))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("c")).localCheckpoint()
    val top = ks.groupBy(col("k")).agg(count(lit(1)).as("n_true"))
      .orderBy(col("n_true").desc, col("k")).limit(auditK).localCheckpoint()
    val est = (0 until depth).foldLeft(
      top.withColumn("est", lit(Long.MaxValue))) { (acc, j) =>
      acc.withColumn("_b", pmod(TextFns.hash60(concat(lit(s"${j}_"),
          col("k"))), lit(width.toLong)))
        .join(broadcast(counters.where(col("j") === j)
          .select(col("bucket").as("_b"), col("c").as(s"_c$j"))), Seq("_b"))
        .withColumn("est", least(col("est"), col(s"_c$j")))
        .drop("_b", s"_c$j")
    }
    est.select(col("k").as("token"), col("n_true"), col("est").as("n_est"),
      (col("est") - col("n_true")).as("overestimate"))
  }
}
