package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VecFns
import graft.operators.Similarity

/** Parity pin for the map-side IVF cell assignment: NearestCells must
  * reproduce the crossJoin(broadcast)+row_number formulation it replaced
  * (same csim arithmetic, same (csim desc, id asc) tie-break), in both
  * interpreted eval and codegen.
  */
class NearestCellsSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    // embeddings with deliberate duplicates (exact csim ties) and
    // negatives; float to exercise the widening path
    (0L until 40L).map { id =>
      (id, Array.tabulate(6)(j =>
        (((id % 7) * (j + 1) - 3 * ((id + j) % 5)).toFloat / 4f)))
    }.toDF("vec_id", "embedding")
  }

  private def windowAssignment(nProbe: Int) = {
    val e = corpus.select(col("vec_id"), col("embedding"),
      Similarity.dotD(col("embedding"), col("embedding")).as("nn"))
    val cents = corpus.filter(col("vec_id") % 8 === 1).select(
      col("vec_id").as("cent_id"), col("embedding").as("cemb"))
      .withColumn("cn", Similarity.dotD(col("cemb"), col("cemb")))
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        (Similarity.dotD(col("embedding"), col("cemb"))
          / sqrt(col("nn") * col("cn"))).as("csim"))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cent_id"))))
      .filter(col("crk") <= nProbe)
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("crk"), col("cent_id")))).as("o"))
      .select(col("vec_id"), transform(col("o"), _.getField("cent_id")).as("cells"))
  }

  private def mapSide(nProbe: Int) = {
    val rows = corpus.filter(col("vec_id") % 8 === 1)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1)
    val norms = rows.map(_._2.foldLeft(0.0)((a, x) => a + x * x))
    corpus.select(col("vec_id"),
      VecFns.nearestCells(col("embedding"), rows.map(_._1),
        rows.flatMap(_._2), norms, 6, nProbe).as("cells"))
  }

  for (nProbe <- Seq(1, 3)) {
    test(s"nearest_cells(k=$nProbe) == crossJoin+row_number assignment") {
      val want = windowAssignment(nProbe).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val got = mapSide(nProbe).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got == want)
    }
  }

  test("zero vector falls back to the first cells in cent_id order (non-empty)") {
    import spark.implicits._
    val rows = corpus.filter(col("vec_id") % 8 === 1)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1)
    val norms = rows.map(_._2.foldLeft(0.0)((a, x) => a + x * x))
    val df = Seq((1L, Array.fill(6)(0f))).toDF("vec_id", "embedding")
    for (k <- Seq(1, 3)) {
      val got = df.select(VecFns.nearestCells(col("embedding"), rows.map(_._1),
        rows.flatMap(_._2), norms, 6, k).as("cells"))
        .collect().head.getSeq[Long](0)
      // all csim are NaN: the kernel must still assign cells — the first
      // k in ascending cent_id order, exactly what the NaN-first
      // descending row_number sort produced (and element_at(cells, 1)
      // must stay ANSI-safe)
      got shouldBe rows.map(_._1).take(k).toSeq
    }
  }

  test("null / length-mismatch inputs yield null") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 2f)),          // wrong dim (cells built for dim 6)
      (2L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    val rows = corpus.filter(col("vec_id") % 8 === 1)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1)
    val norms = rows.map(_._2.foldLeft(0.0)((a, x) => a + x * x))
    val out = df.select(VecFns.nearestCells(col("embedding"), rows.map(_._1),
      rows.flatMap(_._2), norms, 6, 2).as("cells")).collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
