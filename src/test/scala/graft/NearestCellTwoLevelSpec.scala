package graft

import org.apache.spark.sql.functions._
import graft.functions.{NearestCellTwoLevel, VecFns}

/** Parity + invariant pins for the two-level (hierarchical-IVF) cell
  * assignment: the codegen kernel must reproduce an independent
  * driver-side reimplementation of the SAME rule (nearest super by
  * earliest strict max, then nearest member cell), the index must
  * partition the codebook, and well-separated clusters must make the
  * two-level choice agree with the flat argmax. */
class NearestCellTwoLevelSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 6

  private def mkCorpus(n: Int): Seq[(Long, Array[Float])] =
    (0L until n.toLong).map { id =>
      (id, Array.tabulate(dim)(j =>
        (((id % 11) * (j + 2) - 3 * ((id + j) % 7)).toFloat / 4f)))
    }

  private def codebook(corpus: Seq[(Long, Array[Float])], mod: Long) = {
    val rows = corpus.filter(_._1 % mod == 1)
      .map { case (id, v) => (id, v.map(_.toDouble)) }.sortBy(_._1)
    val norms = rows.map(_._2.foldLeft(0.0)((a, x) => a + x * x)).toArray
    (rows.map(_._1).toArray, rows.flatMap(_._2).toArray, norms)
  }

  test("buildIndex partitions the codebook; every super is in its own group") {
    val (ids, flat, norms) = codebook(mkCorpus(60), 4)
    val (superPos, memberStart, memberCell) =
      NearestCellTwoLevel.buildIndex(flat, norms, dim)
    memberStart.last shouldBe ids.length
    memberCell.sorted.toSeq shouldBe (0 until ids.length)
    // non-empty groups, each member list ascending
    for (g <- superPos.indices) {
      val mem = memberCell.slice(memberStart(g), memberStart(g + 1)).toSeq
      mem should not be empty
      mem shouldBe mem.sorted
      mem should contain(superPos(g)) // self-membership (cos = 1)
    }
  }

  test("kernel matches an independent driver-side hierarchical reimplementation") {
    val corpus = mkCorpus(80)
    val (ids, flat, norms) = codebook(corpus, 4) // 20 cells
    val (superPos, memberStart, memberCell) =
      NearestCellTwoLevel.buildIndex(flat, norms, dim)
    // independent witness: plain Scala, no shared kernel code path
    def assign(v: Array[Float]): Long = {
      val e = v.map(_.toDouble)
      val nn = e.foldLeft(0.0)((a, x) => a + x * x)
      def cs(c: Int): Double = {
        var d = 0.0; var i = 0
        while (i < dim) { d += e(i) * flat(c * dim + i); i += 1 }
        d / math.sqrt(nn * norms(c))
      }
      val s = superPos.indices.foldLeft((-1, Double.NegativeInfinity)) {
        case ((bi, bs), i) =>
          val c = cs(superPos(i)); if (c > bs) (i, c) else (bi, bs)
      }._1 match { case -1 => 0; case x => x }
      val mem = memberCell.slice(memberStart(s), memberStart(s + 1))
      val c = mem.foldLeft((-1, Double.NegativeInfinity)) {
        case ((bi, bs), m) =>
          val cv = cs(m); if (cv > bs) (m, cv) else (bi, bs)
      }._1 match { case -1 => mem.head; case x => x }
      ids(c)
    }
    val want = corpus.map { case (id, v) => id -> assign(v) }.toMap
    val got = corpus.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        VecFns.nearestCellTwoLevel(col("embedding"), ids, flat, norms, dim)
          .as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe want
  }

  test("well-separated clusters: two-level equals flat argmax") {
    // 4 orthogonal cluster axes; points hug one axis -> the hierarchy
    // cannot disagree with the flat assignment
    val pts = (0L until 48L).map { id =>
      val ax = (id % 4).toInt
      val v = Array.fill(dim)(0.01f * ((id % 5).toInt - 2))
      v(ax) = 5f + (id % 3)
      (id, v)
    }
    val cents = (0L until 4L).map { a =>
      val v = new Array[Float](dim); v(a.toInt) = 1f; (a + 100L, v)
    }
    val all = (pts ++ cents).toDF("vec_id", "embedding")
    val rows = cents.map { case (id, v) => (id, v.map(_.toDouble)) }.sortBy(_._1)
    val norms = rows.map(_._2.foldLeft(0.0)((a, x) => a + x * x)).toArray
    val ids = rows.map(_._1).toArray
    val flat = rows.flatMap(_._2).toArray
    val two = all.select(col("vec_id"),
        VecFns.nearestCellTwoLevel(col("embedding"), ids, flat, norms, dim)
          .as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val one = all.select(col("vec_id"),
        element_at(VecFns.nearestCells(col("embedding"), ids, flat, norms,
          dim, 1), 1).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    two shouldBe one
  }

  test("zero vector falls back to super 0's smallest member id; nulls stay null") {
    val (ids, flat, norms) = codebook(mkCorpus(40), 4)
    val (superPos, memberStart, memberCell) =
      NearestCellTwoLevel.buildIndex(flat, norms, dim)
    val expectFallback = ids(memberCell(memberStart(0)))
    val df = Seq(
      (1L, Some(Array.fill(dim)(0f))), // zero vector: all csim NaN
      (2L, None),                      // null embedding
      (3L, Some(Array.fill(dim + 1)(1f)))) // wrong dim
      .toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
        VecFns.nearestCellTwoLevel(col("embedding"), ids, flat, norms, dim)
          .as("cell"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    out(1L) shouldBe Some(expectFallback)
    out(2L) shouldBe None
    out(3L) shouldBe None
  }
}
