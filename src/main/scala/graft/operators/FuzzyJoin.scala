package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) self-join — the entity-resolution /
  * spelling-variant primitive: find all record pairs within Levenshtein
  * distance k WITHOUT the all-pairs product.
  *
  * Blocking is the FastSS / SymSpell deletion neighborhood (Bocek et
  * al. 2007, "Fast Similarity Search in Large Dictionaries"): if
  * ed(a, b) ≤ k then deleting ≤ k chars from each can reach a COMMON
  * string (decompose an optimal edit script: drop from `a` the chars it
  * substitutes-or-deletes, from `b` the chars it substitutes-or-inserts
  * — each side ≤ k deletions). So candidates = pairs sharing at least
  * one ≤k-deletion variant, found by an EQUI join on the variant
  * string; the exact `levenshtein` verify then removes the false
  * positives the neighborhood admits. Candidate generation is complete
  * by the theorem; output is exact by the verify.
  *
  * 100 TB shape: per record the variant fan-out is 1 + n + n(n−1)/2-ish
  * (bounded by the record length, a small constant for
  * dictionary/phrase records); the join is a plain hash equi join on
  * the variant key (hot variants are data-bounded, AQE skew-split
  * applies); the only corpus-sized shuffles carry (variant, record)
  * string pairs. The verify is map-side. Never an inequality join, no
  * cross product anywhere. */
object FuzzyJoin {

  /** One-deletion images of `c`, guarded for the empty string (Spark's
    * `sequence(0, -1)` counts DOWN, not empty). */
  private def del1(c: Column): Column =
    when(length(c) >= 1,
      transform(sequence(lit(0), length(c) - 1),
        i => concat(c.substr(lit(1), i), c.substr(i + lit(2), length(c)))))
      .otherwise(array().cast("array<string>"))

  /** The distinct ≤k-deletion neighborhood of `c` (k ∈ {1, 2}),
    * including `c` itself. */
  def deletionVariants(c: Column, k: Int): Column = {
    require(k == 1 || k == 2, s"deletion neighborhood supports k in {1,2}, got $k")
    val d1 = del1(c)
    val all =
      if (k == 1) concat(array(c), d1)
      else concat(array(c), d1, flatten(transform(d1, d =>
        when(length(d) >= 1,
          transform(sequence(lit(0), length(d) - 1),
            j => concat(d.substr(lit(1), j), d.substr(j + lit(2), length(d)))))
          .otherwise(array().cast("array<string>")))))
    array_distinct(all)
  }

  /** All unordered record pairs (s_a < s_b) with
    * levenshtein(s_a, s_b) ≤ maxDist, plus the exact distance.
    * `records` should be distinct on `strCol` (duplicates only cost
    * work, not correctness — the pair set is distinct either way). */
  def selfJoin(records: DataFrame, strCol: String, maxDist: Int): DataFrame = {
    val v = records.select(col(strCol).cast("string").as("s"))
      .select(col("s"), explode(deletionVariants(col("s"), maxDist)).as("_v"))
    val pairs = v.as("a").join(v.as("b"),
        col("a._v") === col("b._v") && col("a.s") < col("b.s"))
      .select(col("a.s").as("s_a"), col("b.s").as("s_b"))
      .distinct()
    pairs
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= maxDist)
  }
}
