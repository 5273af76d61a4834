package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Spectral / geometric audits over an embedding column (builder brief
  * §2.9b L79–L80): the dominant principal direction by power iteration,
  * and the per-label centroid-similarity matrix — the "is my embedding
  * space collapsing / are two sources the same thing" numbers.
  *
  * Engine-exact arithmetic convention (the q60/L53 rule, applied to
  * linear algebra): every float that enters a distributed SUM is first
  * floor-quantized at 2^30 fixed point — multiplication by a power of
  * two is EXACT in IEEE 754 (exponent shift), floor has no rounding
  * mode, and the integer sums that follow are order-independent. The
  * only remaining float ops (divisions, sqrt, the final cosines) are
  * correctly-rounded IEEE primitives computed in a fixed expression
  * order, so both engines produce bit-identical results.
  */
object Spectral {

  /** 2^30 fixed-point scale shared by both operators and their oracles. */
  val Q: Double = 1073741824.0

  /** Fixed-point floor quantization of a double column. */
  private def fq(c: Column): Column = floor(c * Q).cast("long")

  /** L79 — dominant principal component by power iteration on the
    * second-moment matrix M = Σ x·xᵀ (uncentered PCA — the
    * anisotropy/collapse audit for an embedding space: a dominant
    * direction with an outsized eigenvalue means cosine similarity is
    * being driven by one axis). Returns one row per dimension:
    * (d, loading, lambda) — the unit dominant vector after `iters`
    * iterations from the deterministic start ones/√dim, and the
    * Rayleigh estimate λ = ‖M·v‖ of its eigenvalue (per-row mean
    * second moment — intensive, corpus-size-free).
    *
    * 100 TB shape: M is built in ONE corpus scan — the per-row dim×dim
    * product expansion map-combines into ≤ dim² partial sums per task,
    * so the single exchange carries a dim²-row frame no matter the
    * corpus size; the iterations are driver-side arithmetic on that
    * dim×dim matrix (the codebook-collect precedent — dim² = 4096
    * values for dim 64), costing ZERO further scans. Per-product
    * fixed-point quantization makes the matrix — and therefore every
    * downstream iterate — engine-exact. */
  def dominantComponent(vectors: DataFrame, dim: Int,
                        iters: Int = 3): DataFrame = {
    val spark = vectors.sparkSession
    // M in ONE pass through the native MomentMatrixAgg kernel: a tight
    // O(dim²) per-row loop into a primitive long[dim²] buffer — the
    // explode-dim²-structs formulation of the same sum pushed dim²·n
    // rows through the hash aggregate and measured 11-16× slower
    // (sf1 7.1 s → 0.66 s, sf5 14.2 s → 0.91 s; SCALE.md round 6).
    // The shuffle carries one dim²-long buffer per task (scalar-merge
    // shape). M is the MEAN second moment (sums div n): entries are
    // O(E[x_ix_j]) regardless of corpus size, so every fixed-point
    // integer downstream stays far below 2^53 — the bound where
    // int→double conversion is exact in any engine (DuckDB's
    // wide-decimal→double cast is not correctly rounded above it; see
    // centroidSimilarity).
    val row = vectors.agg(
      graft.functions.MomentMatrixAgg.momentMatrix(col("embedding"), dim)
        .as("m"),
      count(lit(1)).as("n")).head()
    val n = row.getLong(1)
    val mSums = row.getSeq[Long](0)
    // Empty input: return an EMPTY frame — the shape the SQL oracle's
    // CTE chain yields over an empty table. (Pre-r7 this emitted dim
    // rows of NaN loadings from the zero matrix; operator and oracle
    // disagreed on the degenerate shape.)
    if (n == 0L) {
      import spark.implicits._
      return Seq.empty[(Long, Double, Double)].toDF("d", "loading", "lambda")
    }
    val mq = mSums.map(s => java.math.BigInteger.valueOf(s)
      .divide(java.math.BigInteger.valueOf(n)).longValueExact()).toArray
    val m = mq.map(_.toDouble / Q)
    // power iteration with the SAME quantize-before-sum rule the SQL
    // oracle applies, so every iterate is bit-identical cross-engine.
    // Start = ones/√dim: deterministic, and not orthogonal to a planted
    // axis the way a basis vector can be (e₀ ⊥ dominant ⇒ no progress).
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    for (_ <- 0 until iters) {
      val yq = Array.tabulate(dim) { j =>
        var s = 0L
        var i = 0
        while (i < dim) {
          s += math.floor(m(j * dim + i) * v(i) * Q).toLong
          i += 1
        }
        s
      }
      val y = yq.map(_.toDouble / Q)
      var nq = 0L
      y.foreach(yj => nq += math.floor(yj * yj * Q).toLong)
      val norm = math.sqrt(nq.toDouble / Q)
      lambda = norm
      v = y.map(_ / norm)
    }
    import spark.implicits._
    v.zipWithIndex.map { case (l, d) => (d.toLong, l, lambda) }
      .toSeq.toDF("d", "loading", "lambda")
  }

  /** SQL oracle fragment for [[dominantComponent]]: the same M build
    * and unrolled iterations over a (k, mq) CTE — interpolated by the
    * query registry so operator and oracle share one definition of the
    * quantization. `emb` is the embedding column name, `tbl` the table. */
  def sqlDominantComponent(tbl: String, emb: String, dim: Int,
                           iters: Int): String = {
    val qL = Q.toLong
    val mBuild =
      s"""pr AS (SELECT (i.d * $dim + j.d) AS k,
              CAST(floor(CAST($emb[i.d + 1] AS DOUBLE)
                * CAST($emb[j.d + 1] AS DOUBLE) * $qL) AS BIGINT) AS q
            FROM $tbl,
              LATERAL (SELECT unnest(range($dim)) AS d) i,
              LATERAL (SELECT unnest(range($dim)) AS d) j),
          m AS (SELECT k, CAST(CAST(sum(q) AS HUGEINT)
                  // (SELECT count(*) FROM $tbl) AS DOUBLE) / $qL AS mv
                FROM pr GROUP BY k)"""
    // v0 = ones/sqrt(dim); norms/sums quantized exactly as the Scala
    val v0 =
      s"""v0 AS (SELECT CAST(d AS BIGINT) AS j, 1e0 / sqrt($dim) AS v
           FROM (SELECT unnest(range($dim)) AS d))"""
    val its = (1 to iters).map { t =>
      val y =
        s"""y$t AS (SELECT m.k // $dim AS j,
               CAST(sum(CAST(floor(m.mv * v${t - 1}.v * $qL) AS BIGINT))
                 AS DOUBLE) / $qL AS y
             FROM m JOIN v${t - 1} ON m.k % $dim = v${t - 1}.j
             GROUP BY m.k // $dim)"""
      val n =
        s"""n$t AS (SELECT sqrt(CAST(sum(CAST(floor(y * y * $qL) AS BIGINT))
             AS DOUBLE) / $qL) AS nrm FROM y$t)"""
      val v = s"v$t AS (SELECT j, y / nrm AS v FROM y$t, n$t)"
      s"$y,\n          $n,\n          $v"
    }.mkString(",\n          ")
    s"""WITH $mBuild,
          $v0,
          $its
        SELECT CAST(j AS BIGINT) AS d, v AS loading,
          (SELECT nrm FROM n$iters) AS lambda
        FROM v$iters"""
  }

  /** Deterministic JL sign: ±1 from the parity of the [[Similarity]]
    * plane mix REDUCED MOD 1009 first — identical in both engines by
    * integer arithmetic. (Parity of the raw mix is useless: A_k is
    * always odd, so `(A·(j+1)+B) % 2` depends only on j's parity and
    * every row collapses to ± one alternating vector — a rank-1
    * "projection". The odd-prime residue mixes properly.) */
  def jlSign(k: Int, j: Int): Int =
    1 - 2 * ((((Similarity.planeA(k) * (j + 1) + Similarity.planeB(k))
      % 1009) % 2).toInt)

  /** The k-th JL projection component: a codegen'd VecDot against the
    * literal ±1/√K sign vector (folds into the plan as a constant). */
  def jlComponent(emb: Column, dim: Int, kOut: Int, k: Int): Column =
    graft.functions.VecFns.vecDot(emb,
      typedLit((0 until dim).map(j =>
        jlSign(k, j).toDouble / math.sqrt(kOut.toDouble))))

  /** SQL mirror of [[jlComponent]] — the same left-fold, the same
    * per-term sign arithmetic and 1/√K division. */
  def sqlJlComponent(emb: String, dim: Int, kOut: Int, k: Int): String =
    s"""list_reduce(list_transform(range(0, $dim),
        j -> $emb[j + 1]::DOUBLE *
          (CAST(1 - 2 * (((${Similarity.planeA(k)} * (j + 1)
             + ${Similarity.planeB(k)}) % 1009) % 2) AS DOUBLE)
           / sqrt(CAST($kOut AS DOUBLE)))),
        (x, y) -> x + y)"""

  /** L83 — Johnson-Lindenstrauss projection + distortion audit: project
    * embeddings to `kOut` dims with a deterministic ±1/√K sign matrix
    * (the database-friendly JL construction — Achlioptas 2003) and
    * report, for every probe pair, the original vs projected squared
    * distance and their ratio — the "how few dims can ANN run in"
    * measurement; storage/IO at 100 TB is linear in kept dims, which is
    * the same argument as L63's truncation but for a basis-free random
    * projection that needs no Matryoshka training.
    *
    * 100 TB shape: the projection is MAP-SIDE ONLY — kOut codegen'd
    * VecDot folds against literal sign vectors, zero shuffles, zero
    * broadcast (the matrix is plan literals); the audit restricts to a
    * fixed probe sample whose pair frame is probe²-bounded. Distances
    * use the ‖a‖²−2ab+‖b‖² identity over the same left-fold dot, so
    * every float is engine-exact. */
  def jlDistortion(vectors: DataFrame, isProbe: Column, dim: Int,
                   kOut: Int): DataFrame = {
    val projCols = (0 until kOut).map(k =>
      jlComponent(col("embedding"), dim, kOut, k).as(s"y$k"))
    val probes = vectors.where(isProbe)
      .select(col("vec_id") +: col("embedding") +: projCols: _*)
    val a = probes.toDF(probes.columns.map(c => s"a_$c"): _*)
    val b = probes.toDF(probes.columns.map(c => s"b_$c"): _*)
    val dot = graft.functions.VecFns.vecDot(col("a_embedding"), col("b_embedding"))
    val na = graft.functions.VecFns.vecDot(col("a_embedding"), col("a_embedding"))
    val nb = graft.functions.VecFns.vecDot(col("b_embedding"), col("b_embedding"))
    val d2p = (0 until kOut).map { k =>
      val d = col(s"a_y$k") - col(s"b_y$k"); d * d
    }.reduceLeft(_ + _)
    a.crossJoin(b).where(col("a_vec_id") < col("b_vec_id"))
      .select(col("a_vec_id").as("id_a"), col("b_vec_id").as("id_b"),
        (na - lit(2.0) * dot + nb).as("d2_orig"), d2p.as("d2_proj"))
      .withColumn("ratio", col("d2_proj") / col("d2_orig"))
  }

  /** L89 — embedding mean-pooling: collapse vector groups (passages of
    * a document, frames of a clip, near-dup cluster members) to one
    * mean vector each, with member count and L2 norm — the
    * passage→document pooling step every retrieval corpus runs before
    * indexing at document grain. Per-dim means use the [[centroidSimilarity]]
    * fixed-point derivation (exact integer sums, integer division,
    * every int below 2^53), so pooled vectors are bit-identical across
    * engines and partitionings.
    *
    * 100 TB shape: ONE (group, dim)-keyed map-combined aggregate
    * (≤ groups·dim partial rows per task), then a group-keyed array
    * rebuild under the same partitioning (HashPartitioning(group, dim)
    * does NOT satisfy (group) clustering — this one re-shuffles
    * groups·dim rows, which is the pooled OUTPUT size, not the corpus). */
  def meanPool(vectors: DataFrame, groupCol: Column): DataFrame = {
    def idiv(a: Column, b: Column): Column = {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        Bridge.expression(a), Bridge.expression(b)))
    }
    val sums = vectors.select(groupCol.as("g"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("g"), col("d"))
      .agg(sum(fq(col("x").cast("double")).cast(DecimalType(38, 0))).as("sx"),
        count(lit(1)).as("n"))
      .select(col("g"), col("d"), col("n"),
        (idiv(col("sx"), col("n").cast(DecimalType(38, 0)) * 1024)
          .cast("double") / 1048576.0).as("cv"))
    sums.groupBy(col("g"))
      .agg(max(col("n")).as("n_members"),
        transform(array_sort(collect_list(struct(col("d"), col("cv")))),
          x => x("cv")).as("pooled"))
      .select(col("g").as("group_id"), col("n_members"), col("pooled"),
        sqrt(graft.functions.VecFns.vecDot(col("pooled"), col("pooled")))
          .as("norm"))
  }

  /** L86 — per-label embedding outliers: the `topK` vectors FURTHEST
    * from their own label's centroid — the mislabel/poison/ingest-noise
    * shortlist a labeled embedding corpus is audited with (the ranked
    * complement of [[graft.operators.Similarity.labelPurity]]'s
    * aggregate view). Centroids use the [[centroidSimilarity]] 2^20
    * fixed-point derivation (exact sums, integer division, every int
    * below 2^53); distances are the ‖x‖² − 2x·ĉ + ‖ĉ‖² identity over
    * the left-fold dot, so ranking is engine-exact.
    *
    * 100 TB shape: ONE (label, dim)-keyed map-combined aggregate builds
    * the centroid frame (≤ labels·dim rows), which pivots to ≤ labels
    * centroid ARRAYS and broadcasts back onto the corpus — the distance
    * pass is map-side; the per-label top-k compiles to WindowGroupLimit
    * (every task keeps k per label before the single exchange). */
  def centroidOutliers(vectors: DataFrame, labelCol: Column,
                       topK: Int): DataFrame = {
    def idiv(a: Column, b: Column): Column = {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        Bridge.expression(a), Bridge.expression(b)))
    }
    val sums = vectors.select(labelCol.as("lbl"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("lbl"), col("d"))
      .agg(sum(fq(col("x").cast("double")).cast(DecimalType(38, 0))).as("sx"),
        count(lit(1)).as("n"))
      .select(col("lbl"), col("d"),
        idiv(col("sx"), col("n").cast(DecimalType(38, 0)) * 1024).as("c"))
    val cents = sums.groupBy(col("lbl"))
      .agg(transform(array_sort(collect_list(struct(col("d"),
          (col("c").cast("double") / 1048576.0).as("cv")))),
        x => x("cv")).as("carr"))
    val dist = vectors.select(labelCol.as("lbl"), col("vec_id"),
        col("embedding"))
      .join(broadcast(cents), Seq("lbl"))
      .select(col("lbl").as("label"), col("vec_id"),
        (graft.functions.VecFns.vecDot(col("embedding"), col("embedding"))
          - lit(2.0) * graft.functions.VecFns.vecDot(col("embedding"), col("carr"))
          + graft.functions.VecFns.vecDot(col("carr"), col("carr"))).as("d2"))
    dist.withColumn("rk", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("d2").desc, col("vec_id"))))
      .where(col("rk") <= topK)
  }

  /** L80 — per-label centroid-similarity matrix: the cosine between the
    * mean embeddings of every label pair (a ≤ b) plus member counts —
    * the "are these two sources/classes the same thing in embedding
    * space" redundancy map that decides merges and mixture weights one
    * level above [[Dedup.sourceOverlapMatrix]]'s lexical overlap.
    *
    * Numeric contract: per-dim sums quantize at 2^30 (exact integer
    * agg); the CENTROID then re-quantizes to 2^20 fixed point by
    * integer division (truncation toward zero — Spark `div` and DuckDB
    * `//` agree), which keeps every downstream integer — per-dim
    * products and their 64-term sums — strictly below 2^53, where
    * int→double conversion is EXACT in any engine. That bound is the
    * whole design: DuckDB's wide-decimal→double cast is not correctly
    * rounded, so no integer allowed near a double is ever wider than
    * 53 bits. Valid while per-dim centroids stay under 8 in magnitude
    * (then c < 2^23 and Σ₆₄ c² < 2^53); unit-ish embeddings are far
    * inside.
    *
    * 100 TB shape: ONE (label, dim)-keyed map-combined aggregate —
    * ≤ labels·dim partial rows per task; the centroid frame
    * (labels·dim rows) self-joins into the ≤ labels² matrix. The
    * corpus never shuffles and nothing downstream depends on its
    * size. */
  def centroidSimilarity(vectors: DataFrame, labelCol: Column): DataFrame = {
    def idiv(a: Column, b: Column): Column = {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        Bridge.expression(a), Bridge.expression(b)))
    }
    val sums = vectors.select(labelCol.as("lbl"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("lbl"), col("d"))
      .agg(sum(fq(col("x").cast("double")).cast(DecimalType(38, 0))).as("sx"),
        count(lit(1)).as("n"))
      .select(col("lbl"), col("d"), col("n"),
        idiv(col("sx"), col("n").cast(DecimalType(38, 0)) * 1024).as("c"))
    val a = sums.select(col("lbl").as("label_a"), col("d"),
      col("c").as("ca"), col("n").as("n_a"))
    val b = sums.select(col("lbl").as("label_b"), col("d"),
      col("c").as("cb"), col("n").as("n_b"))
    a.join(b, Seq("d")).where(col("label_a") <= col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(col("ca") * col("cb")).as("_ab"),
        sum(col("ca") * col("ca")).as("_aa"),
        sum(col("cb") * col("cb")).as("_bb"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        (col("_ab").cast("double")
          / sqrt(col("_aa").cast("double") * col("_bb").cast("double")))
          .as("cos_sim"))
  }
}
