package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Public-suffix (PSL) registered-domain extraction — eTLD+1, the
  * grain crawl corpora aggregate on. Host-level grouping over-splits
  * (`a.blogspot.com` vs `b.blogspot.com` are different SITES) and
  * TLD-level grouping over-merges (`*.co.uk` is not one site); per-
  * domain quotas, dedup scopes and contamination audits all key on
  * the REGISTRABLE domain: the public suffix plus one label.
  *
  * Semantics (publicsuffix.org algorithm): among the list's rules,
  * the longest match wins; `*.X` wildcard rules match any suffix
  * `label.X`; `!Y` exception rules override wildcards (Y is NOT a
  * public suffix — its match length is one label shorter); an
  * unlisted TLD falls to the implicit default rule `*` (the TLD
  * itself is the suffix). A host that IS a public suffix has no
  * registered domain (null).
  *
  * 100 TB shape: pure column algebra — each host explodes to its
  * ≤ label-count candidate suffixes plus their wildcard forms, ONE
  * broadcast equi join against the (bounded: the real PSL is ~9k
  * rules) rule list decides matches (wildcard keys carry their
  * literal `*.` prefix, so one string-equality join serves all three
  * rule kinds), and one host-keyed aggregate takes the longest.
  * The corpus never shuffles by anything but its own key. */
object DomainSuffix {

  /** Adds `public_suffix` and `reg_domain` columns. `psl` uses the
    * list's own syntax: bare suffixes, `*.` wildcards, `!` exceptions.
    * Grouping keys: every column of `df` (the frame is re-aggregated
    * to its original grain after the candidate explode). */
  def registeredDomain(df: DataFrame, hostCol: String,
                       psl: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(psl.nonEmpty, "empty public-suffix list")
    // one row per rule; wildcard rules keep their literal "*." prefix
    // (bare keys never start "*.", so ONE equi join serves all kinds)
    val rules = psl.map { r =>
      if (r.startsWith("!")) (r.substring(1), "exc")
      else if (r.startsWith("*.")) (r, "wild")
      else (r, "norm")
    }.toDF("_rule", "_kind")

    val keyCols = df.columns.map(col).toSeq
    val labels = split(col(hostCol), "\\.")
    val nl = size(labels)
    val k = col("_k")
    val cand = df
      .withColumn("_k", explode(sequence(lit(1), nl)))
      // the k-label suffix, and its wildcard form (first label → "*")
      .withColumn("_suf", array_join(slice(labels, nl - k + 1, k), "."))
      .withColumn("_wild", when(k >= 2, concat(lit("*."),
        array_join(slice(labels, nl - k + 2, k - 1), "."))))
      .withColumn("_key", explode(array(col("_suf"),
        coalesce(col("_wild"), lit("")))))
    val matched = cand.join(broadcast(rules), col("_key") === col("_rule"))
      .groupBy(keyCols: _*)
      .agg(max(when(col("_kind") === "exc", k)).as("_exck"),
        max(when(col("_kind") =!= "exc", k)).as("_pubk"))
    // unmatched hosts (default rule `*`) come back via a LEFT join of
    // the original frame — the corpus side stays on its own grain
    val withK = df.join(matched, df.columns.toSeq, "left")
    val eff = when(col("_exck").isNotNull, col("_exck") - 1)
      .otherwise(greatest(coalesce(col("_pubk"), lit(1)), lit(1)))
    withK
      .withColumn("public_suffix",
        array_join(slice(labels, nl - eff + 1, eff), "."))
      .withColumn("reg_domain", when(nl >= eff + 1,
        array_join(slice(labels, nl - eff, eff + 1), ".")))
      .drop("_exck", "_pubk")
  }
}
