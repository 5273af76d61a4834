package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Deterministic sampling for training-data curation: per-stratum
  * Bernoulli rates and exact-n-per-stratum picks, both keyed on the
  * engine-portable 60-bit md5 hash ([[TextFns.hash60]]) instead of an
  * RNG — so a sample is reproducible across runs, partitionings and
  * engines, and the DuckDB oracle can recompute it bit-exactly.
  * (The reference's feed stage shuffles with an in-memory NumPy
  * permutation, `data_generator.py:46-47`; a keyed hash is the
  * distributed-safe equivalent — no driver-held RNG state.)
  *
  * 100 TB notes: rate-based sampling is a pure map-side filter — no
  * shuffle, and the predicate sits directly on the scan so column
  * pruning/pushdown still apply. Exact-n ranks by the same hash within
  * each stratum — one hash-shuffle on the stratum key; at very large
  * scale, pre-filter with a generous rate (~ a few × n/|stratum|) so
  * the rank window sees ~n rows per stratum rather than the full
  * table.
  */
object Sampling {

  /** Per-mille rate denominator (rates are integers in [0, 1000]). */
  val Mille = 1000L

  /** Salted portable row hash — the ONE derivation behind [[slot]],
    * [[exactNPerStratum]] and [[Packing.packChunks]]; a cross-engine
    * parity contract (mirrored by [[sqlSlot]] and the oracle SQL), so
    * keep every consumer on this helper. */
  def saltedHash(key: Column, salt: String): Column =
    TextFns.hash60(concat(key.cast("string"), lit(":" + salt)))

  /** Uniform [0, Mille) slot for a row key — salted md5, portable. */
  def slot(key: Column, salt: String): Column =
    saltedHash(key, salt) % Mille

  /** DuckDB rendering of [[slot]] (same md5 derivation). */
  def sqlSlot(key: String, salt: String): String =
    s"(${TextFns.sqlHash60(s"CAST($key AS VARCHAR) || ':$salt'")} % $Mille)"

  /** Bernoulli-per-stratum sample: keep a row iff its slot falls below
    * the stratum's per-mille rate (unknown strata get `defaultPerMille`). */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       ratesPerMille: Seq[(String, Int)],
                       defaultPerMille: Int, salt: String): DataFrame = {
    val rate = ratesPerMille.reverse.foldLeft(lit(defaultPerMille)) {
      case (acc, (k, v)) => when(stratum === lit(k), lit(v)).otherwise(acc)
    }
    df.where(slot(key, salt) < rate)
  }

  /** Exact-n-per-stratum sample: the n smallest salted hashes in each
    * stratum — "random" without replacement, yet fully deterministic.
    * Hash ties are broken by the key itself, so the pick is a total
    * order. */
  def exactNPerStratum(df: DataFrame, stratum: Column, key: Column,
                       n: Int, salt: String): DataFrame =
    df.withColumn("_slot", saltedHash(key, salt))
      .withColumn("_rk",
        row_number().over(Window.partitionBy(stratum).orderBy(col("_slot"), key)))
      .where(col("_rk") <= n)
      .drop("_slot", "_rk")

  /** L64 — leakage-safe split: assign train/heldout by the CONTENT key,
    * not the row id, so exact duplicates (and anything else sharing the
    * key — url, cluster id) can never straddle the boundary and leak
    * eval content into training. The assignment is the same salted-hash
    * [[slot]] every sampler uses — deterministic across runs, engines
    * and partitionings, and purely map-side: no shuffle, no join, no
    * RNG. Pass a near-dup cluster id as `key` to harden the guarantee
    * from exact-dup to near-dup level (the q47/q93 component).
    *
    * Adds `split` ∈ {"train", "heldout"}; ~trainPerMille/1000 of
    * DISTINCT keys (not rows) land in train. */
  def leakageSafeSplit(df: DataFrame, key: Column, trainPerMille: Int,
                       salt: String): DataFrame = {
    require(trainPerMille >= 0 && trainPerMille <= Mille,
      s"trainPerMille must be in [0, $Mille]")
    df.withColumn("split",
      when(slot(key, salt) < trainPerMille, "train").otherwise("heldout"))
  }

  /** Temperature / importance resampling — the mixture-reweighting stage
    * of a multilingual training feed: each stratum gets a per-mille
    * repeat factor (1000 = keep as-is, 500 = downsample half, 2300 =
    * 2.3× upsample), and every row is emitted `factor // 1000` times
    * plus one more iff its [[slot]] falls below `factor % 1000` — so the
    * EXACT expected multiplicity, with the fractional part decided by
    * the same salted hash as the samplers (deterministic across runs,
    * partitionings and engines; no RNG).
    *
    * Output = the input columns plus `copy` (1-based repeat index);
    * rows whose multiplicity is 0 vanish. The `where` guard matters:
    * Spark's `sequence(1, 0)` is the DESCENDING `[1, 0]`, not empty.
    *
    * 100 TB shape: multiplicity is map-side column math and the copies
    * come from one generator per surviving row — no shuffle, no join,
    * and the blow-up is exactly the configured mixture weight. */
  def temperatureResample(df: DataFrame, stratum: Column, key: Column,
                          factorsPerMille: Seq[(String, Int)],
                          defaultPerMille: Int, salt: String): DataFrame = {
    require(factorsPerMille.forall(_._2 >= 0) && defaultPerMille >= 0,
      "repeat factors must be non-negative")
    val factor = factorsPerMille.reverse.foldLeft(lit(defaultPerMille)) {
      case (acc, (k, v)) => when(stratum === lit(k), lit(v)).otherwise(acc)
    }
    val mult = (factor.cast("long") / Mille).cast("long") +
      when(slot(key, salt) < pmod(factor.cast("long"), lit(Mille)), 1L).otherwise(0L)
    df.withColumn("_mult", mult)
      .where(col("_mult") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("_mult"))))
      .drop("_mult")
  }

  /** L82 — weighted sampling without replacement by PRIORITY SAMPLING
    * (Duffield/Lund/Thorup): each row draws a deterministic uniform
    * u ∈ (0,1] from its salted hash, takes priority w/u, and the n
    * largest priorities are the sample — heavier rows win
    * proportionally more often, yet the pick is exactly reproducible
    * across runs, engines and partitionings (no RNG anywhere, the
    * [[saltedHash]] contract). Emits the sampled rows with their
    * priority; ties (hash collisions) break on the key.
    *
    * 100 TB shape: priority is map-side column math; the top-n cut
    * compiles to TakeOrderedAndProject (per-partition heaps of n, one
    * n-row merge — never a global sort). */
  def prioritySample(df: DataFrame, key: Column, weight: Column,
                     n: Int, salt: String): DataFrame = {
    // u = (hash+1) / 2^60 ∈ (0, 1]; priority = w/u = w * 2^60 / (hash+1)
    // — the 2^60 scaling is a power of two (exact), and the division is
    // one correctly-rounded fp op on identical operands in both engines.
    val h = saltedHash(key, salt)
    df.withColumn("priority",
        weight.cast("double") * math.pow(2.0, 60) / (h + 1).cast("double"))
      .orderBy(col("priority").desc, key)
      .limit(n)
  }

  /** DuckDB rendering of [[prioritySample]]'s priority. */
  def sqlPriority(weight: String, key: String, salt: String): String =
    s"(CAST($weight AS DOUBLE) * 1152921504606846976e0" +
      s" / CAST(${TextFns.sqlHash60(s"CAST($key AS VARCHAR) || ':$salt'")}" +
      s" + 1 AS DOUBLE))"

  /** L112 — EXACT-TOTAL proportional (stratified) sampling: sample
    * exactly `total` rows overall, allocated across strata
    * proportionally to their observed sizes with LARGEST-REMAINDER
    * rounding (Hamilton's method: base = floor(total·n_s/N), then the
    * (total − Σbase) strata with the largest remainders get +1, ties on
    * the stratum value) — the allocation survey samplers and eval-set
    * builders need when "about 10% per stratum" must land on an exact
    * budget. Within each stratum the quota is filled by the smallest
    * salted hashes ([[saltedHash]]): deterministic across runs, engines
    * and partitionings, ties broken on the key. All arithmetic is
    * integer (exact on both engines); `total` is capped at 1e6 so
    * total·n_s can't overflow a long before strata reach ~9e12 rows.
    *
    * 100 TB shape: ONE corpus pass builds the per-stratum counts (a
    * strata-bounded frame; the allocation windows over it are
    * SinglePartition by construction but run on |strata| rows). The
    * selection ranks within each stratum and CAPS the window at the
    * literal `total` first — that literal bound is what compiles to
    * WindowGroupLimit (per-task top-`total` heaps before the stratum
    * shuffle), so the rank never materializes a full-stratum sort
    * output; the exact per-stratum cut then applies the broadcast
    * quota. Returns the input columns of the sampled rows. */
  def proportionalSample(df: DataFrame, stratum: Column, key: Column,
                         total: Long, salt: String): DataFrame = {
    require(total > 0 && total <= 1000000L,
      "total must be in [1, 1e6] (long-overflow bound on total * |stratum|)")
    val everything = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val quotas = df.groupBy(stratum.as("_st")).agg(count(lit(1)).as("_n"))
      // "_ntot", not "_N": Spark resolves column names case-insensitively
      // by default, so a "_N" withColumn would silently REPLACE "_n"
      .withColumn("_ntot", sum(col("_n")).over(everything))
      .withColumn("_base", expr(s"CAST($total AS BIGINT) * _n DIV _ntot"))
      .withColumn("_rem", expr(s"CAST($total AS BIGINT) * _n % _ntot"))
      .withColumn("_def", lit(total) - sum(col("_base")).over(everything))
      .withColumn("_rrk", row_number().over(
        Window.orderBy(col("_rem").desc, col("_st").asc)))
      .select(col("_st"),
        (col("_base") + when(col("_rrk") <= col("_def"), 1L).otherwise(0L))
          .as("_quota"))
    val inCols = df.columns.map(col).toSeq
    df.withColumn("_h", saltedHash(key, salt))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(stratum).orderBy(col("_h"), key)))
      .where(col("_rk") <= lit(total)) // literal cap -> WindowGroupLimit
      .join(broadcast(quotas), stratum <=> col("_st"))
      .where(col("_rk") <= col("_quota"))
      .select(inCols: _*)
  }
}
