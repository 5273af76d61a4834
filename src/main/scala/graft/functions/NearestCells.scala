package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the `k` nearest coarse-quantizer cells for
  * an embedding, by cosine similarity against a LITERAL centroid table —
  * the map-side IVF cell-assignment kernel.
  *
  * Why an `Expression` and not `crossJoin(broadcast(centroids)) +
  * row_number over vec_id`: the join/window formulation materializes
  * n×nCells rows and funnels them through a full shuffle just to pick
  * each row's nearest cell — at 10⁹ vectors × 4096 cells that is 4×10¹²
  * intermediate rows (VERDICT r3 #1). This expression does the same
  * n×nCells×dim multiply-adds as a tight codegen'd loop INSIDE the scan
  * stage: zero extra rows, zero shuffles, and the loop is not unrolled so
  * janino's 64 KB method limit is never approached at production cell
  * counts.
  *
  * Parity contract (must match the DuckDB oracle of q40 bit-for-bit):
  *  - centroids are iterated in ascending `cent_id` order and a STRICT
  *    `csim > best` comparison keeps the earliest max — identical to
  *    `row_number() OVER (ORDER BY csim DESC, cent_id ASC)`;
  *  - each dot product and the self-norm are strict left folds in double
  *    precision with float→double widening, the same accumulation
  *    [[VecDot]] performs;
  *  - `csim = dot / sqrt(nn · cn)` with IEEE-correct `sqrt`.
  *
  * Null semantics: null input → null; any null element → null; an
  * embedding whose length differs from the centroid dimension → null.
  * Returns `array<bigint>` of min(k, nCells) cell ids, nearest first.
  *
  * Degenerate rows: a zero vector (or zero-norm centroids) makes every
  * csim NaN, which the strict `>` comparison never inserts — the
  * result falls back to the first min(k, nCells) cells in cent_id
  * order, matching the NaN-first descending sort of the row_number
  * formulation this kernel replaced, and guaranteeing a NON-empty
  * array (so `element_at(cells, 1)` is ANSI-safe downstream).
  */
case class NearestCells(
    child: Expression,
    centIds: Array[Long],
    centFlat: Array[Double],
    centNorms: Array[Double],
    dim: Int,
    k: Int) extends UnaryExpression {

  require(k >= 1, s"nearest_cells needs k >= 1, got $k")
  require(centIds.length * dim == centFlat.length,
    s"centroid table shape mismatch: ${centIds.length} ids × $dim != ${centFlat.length}")
  require(centIds.length == centNorms.length, "one norm per centroid required")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells"

  private def elemIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(input: Any): Any = {
    val av = input.asInstanceOf[ArrayData]
    if (av.numElements() != dim) return null
    val e = new Array[Double](dim)
    val isD = elemIsDouble
    var i = 0
    while (i < dim) {
      if (av.isNullAt(i)) return null
      e(i) = if (isD) av.getDouble(i) else av.getFloat(i).toDouble
      i += 1
    }
    var nn = 0.0
    i = 0
    while (i < dim) { nn += e(i) * e(i); i += 1 }
    val nC = centIds.length
    val bestSim = Array.fill(math.min(k, nC).max(1))(Double.NegativeInfinity)
    val bestId = new Array[Long](bestSim.length)
    var filled = 0
    var c = 0
    while (c < nC) {
      var dot = 0.0
      val base = c * dim
      i = 0
      while (i < dim) { dot += e(i) * centFlat(base + i); i += 1 }
      val csim = dot / math.sqrt(nn * centNorms(c))
      var p = 0
      while (p < bestSim.length && !(csim > bestSim(p))) p += 1
      if (p < bestSim.length) {
        var q = bestSim.length - 1
        while (q > p) { bestSim(q) = bestSim(q - 1); bestId(q) = bestId(q - 1); q -= 1 }
        bestSim(p) = csim
        bestId(p) = centIds(c)
        if (filled < bestSim.length) filled += 1
      }
      c += 1
    }
    if (filled == 0 && nC > 0) {
      // all-NaN similarities (zero vector): first kEff cells, in order
      var j = 0
      while (j < bestId.length) { bestId(j) = centIds(j); j += 1 }
      filled = bestId.length
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestId, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ids = ctx.addReferenceObj("centIds", centIds, "long[]")
      val flat = ctx.addReferenceObj("centFlat", centFlat, "double[]")
      val norms = ctx.addReferenceObj("centNorms", centNorms, "double[]")
      val e = ctx.freshName("e")
      val nn = ctx.freshName("nn")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      val dot = ctx.freshName("dot")
      val csim = ctx.freshName("csim")
      val bs = ctx.freshName("bestSim")
      val bi = ctx.freshName("bestId")
      val filled = ctx.freshName("filled")
      val kEff = ctx.freshName("kEff")
      val base = ctx.freshName("base")
      val get = if (elemIsDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $e = new double[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $e[$i] = $get;
         |  }
         |  if (!${ev.isNull}) {
         |    double $nn = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) $nn += $e[$i] * $e[$i];
         |    final int $kEff = Math.max(Math.min($k, $ids.length), 1);
         |    double[] $bs = new double[$kEff];
         |    java.util.Arrays.fill($bs, Double.NEGATIVE_INFINITY);
         |    long[] $bi = new long[$kEff];
         |    int $filled = 0;
         |    for (int $c = 0; $c < $ids.length; $c++) {
         |      double $dot = 0.0;
         |      final int $base = $c * $dim;
         |      for (int $i = 0; $i < $dim; $i++) $dot += $e[$i] * $flat[$base + $i];
         |      final double $csim = $dot / Math.sqrt($nn * $norms[$c]);
         |      int $p = 0;
         |      while ($p < $kEff && !($csim > $bs[$p])) $p++;
         |      if ($p < $kEff) {
         |        for (int $q = $kEff - 1; $q > $p; $q--) {
         |          $bs[$q] = $bs[$q - 1]; $bi[$q] = $bi[$q - 1];
         |        }
         |        $bs[$p] = $csim;
         |        $bi[$p] = $ids[$c];
         |        if ($filled < $kEff) $filled++;
         |      }
         |    }
         |    if ($filled == 0 && $ids.length > 0) {
         |      for (int $q = 0; $q < $kEff; $q++) $bi[$q] = $ids[$q];
         |      $filled = $kEff;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |      java.util.Arrays.copyOf($bi, $filled));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
