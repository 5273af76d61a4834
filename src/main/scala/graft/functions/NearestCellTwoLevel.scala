package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: TWO-LEVEL coarse-quantizer cell
  * assignment — the hierarchical-IVF rule that keeps per-row assignment
  * cost ~O(√C·dim) when the codebook C itself grows with the corpus
  * (the flat [[NearestCells]] argmax is O(C·dim) per row, which turns
  * Lloyd refinement into O(n^1.5) total work once C ≈ √n — the one
  * superlinear curve in the round-6 scale audit).
  *
  * Structure (built once, driver-side, by
  * [[NearestCellTwoLevel.buildIndex]] — deterministic):
  *  - supers = every `stride`-th cell of the id-ascending codebook,
  *    stride = ⌈C/⌈√C⌉⌉;
  *  - every cell belongs to its nearest super by cosine (strict `>`
  *    scan in super-id-ascending order = smallest-super-id tie-break);
  *    a super is always its own nearest (cos = 1), so no group is
  *    empty.
  *
  * Per row: nearest super (≈√C dots), then nearest cell WITHIN that
  * super's member list (≈C/√C dots on balance). This is the standard
  * hierarchical coarse-quantizer approximation — NOT always the flat
  * argmax — so its gate (q60) mirrors the exact same two-level rule in
  * SQL; the flat rule keeps its own gates (q40/q100/q110).
  *
  * Parity contract (bit-for-bit vs the mirroring oracle):
  *  - each dot product / self-norm is the strict left fold in double
  *    precision with float→double widening ([[VecDot]]'s fold);
  *  - `csim = dot / sqrt(nn·cn)` with IEEE sqrt;
  *  - both levels keep the earliest strict max over an id-ascending
  *    scan — identical to `row_number() OVER (ORDER BY csim DESC, id)`;
  *  - all-NaN rows (zero vectors) fall back to super 0, then to that
  *    group's smallest member id — matching NaN-first DESC ordering.
  *
  * Null semantics match [[NearestCells]]: null input / null element /
  * dimension mismatch → null. Returns the winning cell id (bigint). */
case class NearestCellTwoLevel(
    child: Expression,
    centIds: Array[Long],
    centFlat: Array[Double],
    centNorms: Array[Double],
    dim: Int,
    superPos: Array[Int],
    memberStart: Array[Int],
    memberCell: Array[Int]) extends UnaryExpression {

  require(centIds.length * dim == centFlat.length, "centroid table shape mismatch")
  require(centIds.length == centNorms.length, "one norm per centroid required")
  require(superPos.nonEmpty && memberStart.length == superPos.length + 1 &&
    memberCell.length == centIds.length, "two-level index shape mismatch")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell_two_level"

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
    // level 1: nearest super (earliest strict max over ascending ids)
    var bestS = -1
    var bestSim = Double.NegativeInfinity
    var s = 0
    while (s < superPos.length) {
      val base = superPos(s) * dim
      var dot = 0.0
      i = 0
      while (i < dim) { dot += e(i) * centFlat(base + i); i += 1 }
      val csim = dot / math.sqrt(nn * centNorms(superPos(s)))
      if (csim > bestSim) { bestSim = csim; bestS = s }
      s += 1
    }
    if (bestS < 0) bestS = 0 // all-NaN fallback: first super
    // level 2: nearest member cell of the winning group
    var bestC = -1
    bestSim = Double.NegativeInfinity
    var m = memberStart(bestS)
    while (m < memberStart(bestS + 1)) {
      val c = memberCell(m)
      val base = c * dim
      var dot = 0.0
      i = 0
      while (i < dim) { dot += e(i) * centFlat(base + i); i += 1 }
      val csim = dot / math.sqrt(nn * centNorms(c))
      if (csim > bestSim) { bestSim = csim; bestC = c }
      m += 1
    }
    if (bestC < 0) bestC = memberCell(memberStart(bestS)) // group's smallest id
    centIds(bestC)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ids = ctx.addReferenceObj("centIds", centIds, "long[]")
      val flat = ctx.addReferenceObj("centFlat", centFlat, "double[]")
      val norms = ctx.addReferenceObj("centNorms", centNorms, "double[]")
      val sp = ctx.addReferenceObj("superPos", superPos, "int[]")
      val ms = ctx.addReferenceObj("memberStart", memberStart, "int[]")
      val mc = ctx.addReferenceObj("memberCell", memberCell, "int[]")
      val e = ctx.freshName("e")
      val nn = ctx.freshName("nn")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val csim = ctx.freshName("csim")
      val bestS = ctx.freshName("bestS")
      val bestC = ctx.freshName("bestC")
      val bestSim = ctx.freshName("bestSim")
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
         |    int $bestS = -1;
         |    double $bestSim = Double.NEGATIVE_INFINITY;
         |    for (int $s = 0; $s < $sp.length; $s++) {
         |      final int $base = $sp[$s] * $dim;
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) $dot += $e[$i] * $flat[$base + $i];
         |      final double $csim = $dot / Math.sqrt($nn * $norms[$sp[$s]]);
         |      if ($csim > $bestSim) { $bestSim = $csim; $bestS = $s; }
         |    }
         |    if ($bestS < 0) $bestS = 0;
         |    int $bestC = -1;
         |    $bestSim = Double.NEGATIVE_INFINITY;
         |    for (int $m = $ms[$bestS]; $m < $ms[$bestS + 1]; $m++) {
         |      final int $c = $mc[$m];
         |      final int $base = $c * $dim;
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) $dot += $e[$i] * $flat[$base + $i];
         |      final double $csim = $dot / Math.sqrt($nn * $norms[$c]);
         |      if ($csim > $bestSim) { $bestSim = $csim; $bestC = $c; }
         |    }
         |    if ($bestC < 0) $bestC = $mc[$ms[$bestS]];
         |    ${ev.value} = $ids[$bestC];
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCellTwoLevel {

  /** Deterministic two-level index over an id-ascending codebook:
    * supers = every ⌈C/⌈√C⌉⌉-th cell; each cell joins its nearest
    * super's member list (cosine, earliest strict max = smallest super
    * id on ties; zero-norm cells land in group 0). Member lists stay
    * id-ascending, so the level-2 scan's earliest-max tie-break equals
    * `ORDER BY csim DESC, cent_id`. Driver-side cost is C·√C·dim
    * flops on a codebook-sized table — the documented IVF-codebook
    * collect precedent, not a corpus-sized operation. */
  def buildIndex(centFlat: Array[Double], centNorms: Array[Double], dim: Int)
      : (Array[Int], Array[Int], Array[Int]) = {
    val nC = centNorms.length
    require(nC > 0, "empty codebook")
    // A zero-norm elected centroid makes csim NaN for EVERY input row,
    // and engines order NaN differently (DuckDB ranks NaN first in a
    // DESC sort; the kernel's strict '>' never inserts it) — silent
    // oracle divergence. Reject loudly; fix the election instead.
    require(centNorms.forall(_ > 0.0),
      "two-level index: zero-norm elected centroid (cosine undefined); " +
        "elect non-degenerate centroid rows")
    val nS = math.ceil(math.sqrt(nC.toDouble)).toInt
    val stride = math.ceil(nC.toDouble / nS).toInt
    val superPos = (0 until nC by stride).toArray
    val groupOf = new Array[Int](nC)
    var c = 0
    while (c < nC) {
      var best = Double.NegativeInfinity
      var bestS = 0
      var s = 0
      while (s < superPos.length) {
        val sb = superPos(s) * dim
        val cb = c * dim
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += centFlat(cb + i) * centFlat(sb + i); i += 1 }
        val csim = dot / math.sqrt(centNorms(c) * centNorms(superPos(s)))
        if (csim > best) { best = csim; bestS = s }
        s += 1
      }
      groupOf(c) = bestS
      c += 1
    }
    val counts = new Array[Int](superPos.length)
    groupOf.foreach(g => counts(g) += 1)
    // A super is its own nearest (cos=1) unless an EARLIER super is an
    // exact duplicate direction — the one way a group can end up empty.
    // Reject that degenerate codebook LOUDLY rather than risk a
    // level-1/level-2 disagreement. (No silent flat fallback on purpose:
    // a gate whose oracle mirrors the hierarchy would then diverge —
    // the caller must choose the flat kernel, and its oracle, for such
    // codebooks.)
    require(counts.forall(_ > 0),
      "two-level index: duplicate elected supers produce an empty group; " +
        "use the flat nearest-cells assignment (and its oracle) for this codebook")
    val memberStart = new Array[Int](superPos.length + 1)
    var g = 0
    while (g < superPos.length) { memberStart(g + 1) = memberStart(g) + counts(g); g += 1 }
    val fill = memberStart.clone()
    val memberCell = new Array[Int](nC)
    c = 0
    while (c < nC) { // ascending c keeps each member list id-ascending
      memberCell(fill(groupOf(c))) = c
      fill(groupOf(c)) += 1
      c += 1
    }
    (superPos, memberStart, memberCell)
  }
}
