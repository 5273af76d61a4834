package graft

import org.apache.spark.sql.functions._

import graft.operators.Spectral

/** [[graft.operators.Spectral]] — power-iteration convergence to a
  * planted dominant axis, unit-norm output, and centroid-similarity
  * geometry (self = 1, orthogonal = 0). */
class SpectralSpec extends SparkSpec {
  import spark.implicits._

  test("dominantComponent recovers a planted dominant axis, unit-norm") {
    // 200 vectors: strong component on axis 2 (+/- 5), noise elsewhere.
    val vecs = (0 until 200).map { i =>
      val a = Array.tabulate(8)(d => 0.01f * ((i * 7 + d) % 5 - 2))
      a(2) = if (i % 2 == 0) 5f else -5f
      (i.toLong, a.toSeq)
    }.toDF("vec_id", "embedding")
    val out = Spectral.dominantComponent(vecs, 8, iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val loadings = out.sortBy(_._1).map(_._2)
    math.abs(loadings(2)) should be > 0.99
    loadings.map(l => l * l).sum shouldBe 1.0 +- 1e-6
    // lambda ~ mean second moment along the axis = 25
    out.head._3 shouldBe 25.0 +- 1.0
  }

  test("dominantComponent is invariant to row order (exact integer agg)") {
    val base = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(4)(d => (math.sin(i * 1.7 + d) * 3).toFloat).toSeq)
    }
    val a = Spectral.dominantComponent(
      base.toDF("vec_id", "embedding"), 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Spectral.dominantComponent(
      base.reverse.toDF("vec_id", "embedding").repartition(7), 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    a shouldBe b // bit-identical, not approximately equal
  }

  test("dominantComponent on empty input returns an EMPTY frame (oracle CTE shape)") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val out = Spectral.dominantComponent(empty, 4)
    out.columns.toSeq shouldBe Seq("d", "loading", "lambda")
    out.count() shouldBe 0L
  }

  test("pcm_energies and shingle_hashes are callable from SQL text (GraftExtensions)") {
    import graft.functions.TextFns
    Seq((1L, Array[Byte](0x01, 0x00, 0xFF.toByte, 0xFF.toByte)))
      .toDF("media_id", "payload").createOrReplaceTempView("pcm_in")
    val e = spark.sql("SELECT pcm_energies(payload, 2) AS e FROM pcm_in")
      .head().getSeq[Long](0)
    e shouldBe Seq(2L) // 1^2 + (-1)^2
    Seq((1L, Seq("a", "b", "c")))
      .toDF("doc_id", "toks").createOrReplaceTempView("sh_in")
    val viaSql = spark.sql(
      s"SELECT shingle_hashes(toks, 2, ${TextFns.HashMod}) AS hs FROM sh_in")
      .head().getSeq[Long](0)
    val viaCol = Seq((1L, Seq("a", "b", "c"))).toDF("doc_id", "toks")
      .select(TextFns.shingleHashes(col("toks"), 2).as("hs"))
      .head().getSeq[Long](0)
    viaSql shouldBe viaCol
    viaSql.length shouldBe 2
  }

  test("moment_matrix and sum128 are callable from SQL text (GraftExtensions)") {
    Seq((1L, Seq(1f, 2f)), (2L, Seq(3f, 4f)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("mm_in")
    val m = spark.sql("SELECT moment_matrix(embedding, 2) AS m FROM mm_in")
      .head().getSeq[Long](0)
    // m[0] = floor(1*1*2^30) + floor(3*3*2^30) = 10 * 2^30
    m.head shouldBe 10L * (1L << 30)
    m.length shouldBe 4
    val s = spark.sql(
      "SELECT CAST(sum128(CAST(vec_id * 100 AS LONG), 2) AS DOUBLE) FROM mm_in")
      .head().getDouble(0)
    s shouldBe 3.0 +- 1e-12 // (100 + 200) unscaled at scale 2
  }

  test("MomentMatrixAgg matches the explode formulation of the same sum") {
    import org.apache.spark.sql.types.DecimalType
    val dim = 4
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(dim)(d => (math.cos(i * 0.9 + d) * 2).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val kernel = vecs.agg(graft.functions.MomentMatrixAgg
        .momentMatrix(col("embedding"), dim).as("m"))
      .head().getSeq[Long](0)
    val hof = {
      val q = 1073741824.0
      val pairs = vecs.select(explode(flatten(transform(col("embedding"),
          (xi, i) => transform(col("embedding"),
            (xj, j) => struct((i * dim + j).as("k"),
              floor(xi.cast("double") * xj.cast("double") * q)
                .cast("long").as("v")))))).as("e"))
        .select(col("e.k").as("k"), col("e.v").as("v"))
      pairs.groupBy(col("k"))
        .agg(sum(col("v").cast(DecimalType(38, 0))).as("s"))
        .collect().map(r => r.getInt(0) -> r.getDecimal(1).longValueExact())
        .toMap
    }
    kernel.zipWithIndex.foreach { case (v, k) => v shouldBe hof(k) }
  }

  test("jlDistortion: projection preserves distance in expectation, deterministic") {
    // 20 probes in 16 dims -> 190 pairs projected to 8 dims. JL says
    // E[d2_proj] = d2_orig; with ±1/sqrt(K) signs the per-pair ratio
    // concentrates around 1 — assert the MEAN ratio lands near 1.
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(16)(d => (math.sin(i * 2.3 + d * 0.7) * 2).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val rows = Spectral.jlDistortion(vecs, lit(true), 16, 8)
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    rows.length shouldBe 190
    val meanRatio = rows.map { case (o, p) => p / o }.sum / rows.length
    meanRatio shouldBe 1.0 +- 0.35
    // determinism across partitionings (no RNG anywhere)
    val again = Spectral.jlDistortion(vecs.repartition(7), lit(true), 16, 8)
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    again.sortBy(_._1) shouldBe rows.sortBy(_._1)
  }

  test("meanPool: pooled vector is the exact member mean; norm consistent") {
    // group 0: vectors [2,0] and [4,0] -> mean [3, 0], n=2, norm 3
    val vecs = Seq((0L, Seq(2f, 0f)), (1L, Seq(4f, 0f)), (8L, Seq(0f, 5f)))
      .toDF("vec_id", "embedding")
    val out = Spectral.meanPool(vecs, expr("vec_id div 8"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[Double](2), r.getDouble(3)))).toMap
    out(0L)._1 shouldBe 2L
    out(0L)._2.head shouldBe 3.0 +- 1e-5 // 2^-20 quantization grain
    out(0L)._2(1) shouldBe 0.0 +- 1e-5
    out(0L)._3 shouldBe 3.0 +- 1e-5
    out(1L)._1 shouldBe 1L
    out(1L)._2(1) shouldBe 5.0 +- 1e-5
  }

  test("percentileNormalize: rank ratio per group, 0.5 for singletons") {
    import graft.operators.Curation
    val df = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L),
      ("b", 7L, 9L)).toDF("g", "v", "id")
    val out = Curation.percentileNormalize(df, col("g"), col("v"), col("id"))
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    out(1L) shouldBe 0.0 +- 1e-12
    out(2L) shouldBe 0.5 +- 1e-12
    out(3L) shouldBe 1.0 +- 1e-12
    out(9L) shouldBe 0.5 +- 1e-12 // singleton group
  }

  test("centroidOutliers ranks a planted mislabel first in its label") {
    // label 0 clusters near axis 0 — except vec 99, which sits on axis 1
    // (a mislabeled point). It must top label 0's outlier shortlist.
    val vecs = ((0 until 20).map { i =>
      val a = Array.fill(4)(0f); a(0) = 5f + 0.01f * i
      (i.toLong, a.toSeq, 0)
    } :+ {
      val a = Array.fill(4)(0f); a(1) = 5f
      (99L, a.toSeq, 0)
    }).toDF("vec_id", "embedding", "label")
    val top = Spectral.centroidOutliers(vecs, col("label"), 3)
      .orderBy(col("rk")).collect()
    top.head.getLong(1) shouldBe 99L
    top.length shouldBe 3
    // deterministic under repartitioning
    val again = Spectral.centroidOutliers(vecs.repartition(5), col("label"), 3)
      .orderBy(col("rk")).collect()
    again.map(_.getLong(1)).toSeq shouldBe top.map(_.getLong(1)).toSeq
  }

  test("centroidSimilarity: self-pairs cosine 1, orthogonal labels cosine ~0") {
    // label 0 along axis 0, label 1 along axis 1, label 2 = label 0 dir
    val vecs = (0 until 90).map { i =>
      val l = i % 3
      val a = Array.fill(4)(0f)
      a(if (l == 2) 0 else l) = 3f + (i % 5) * 0.1f
      (i.toLong, a.toSeq, l)
    }.toDF("vec_id", "embedding", "label")
    val out = Spectral.centroidSimilarity(vecs, col("label"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(4)).toMap
    out((0, 0)) shouldBe 1.0 +- 1e-9
    out((0, 1)) shouldBe 0.0 +- 1e-9
    out((0, 2)) shouldBe 1.0 +- 1e-6 // same direction, different magnitude
    out.keySet.size shouldBe 6 // pairs with a <= b over 3 labels
  }
}
