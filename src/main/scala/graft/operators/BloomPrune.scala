package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-sketch join pruning (L50) — Spark's runtime row-level filter
  * pattern (`InjectRuntimeFilter`: BloomFilterAggregate on the creation
  * side, `might_contain` on the application side) exposed as an explicit
  * operator for the decontamination scan, where the optimizer's
  * injection heuristics don't reach (the join key is a GENERATED column
  * — exploded shingle hashes — not a scan attribute).
  *
  * 100 TB shape: the eval-side shingle set is often too large to
  * broadcast as a join relation (10⁸ shingles ≈ GBs of HashedRelation)
  * but its bloom sketch is numBits/8 bytes regardless of cardinality.
  * Building the sketch is one map-combined aggregate over the SMALL
  * (eval) side; the sketch travels to the corpus scan as a literal, so
  * the corpus-side shuffle for the exact confirm join carries only
  * bloom-surviving rows (true matches + the fpp tail) instead of every
  * shingle of a 100 TB corpus. False positives are removed by the
  * confirm join — the operator's output is EXACT, the sketch only
  * prunes.
  *
  * Reference anchor: the eval/train overlap scan is the L22 use-case
  * (`Dedup.contaminationReport`); this variant answers the reverse
  * question — which TRAIN docs carry eval content — at corpus scale.
  */
object BloomPrune {

  /** Aggregate a LongType key column into a serialized bloom sketch
    * (driver-held, numBits/8 bytes — codebook-sized by construction,
    * like a trained IVF codebook; NOT corpus-sized). */
  def buildSketch(keys: DataFrame, keyCol: Column,
                  expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = Bridge.column(new BloomFilterAggregate(
      Bridge.expression(keyCol),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    keys.select(agg.as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Scan-stage membership probe against a serialized sketch. */
  def mightContain(sketch: Array[Byte], keyCol: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType), Bridge.expression(keyCol)))

  /** Scan-stage membership probe against a sketch built by a SCALAR
    * SUBQUERY over the build side — the exact `InjectRuntimeFilter`
    * shape, but placed by the library where the optimizer's heuristics
    * can't (the probe key is a generated column). One Spark job: the
    * subquery's one-row result ships to the probe-side tasks with no
    * driver round-trip, and plans print as `scalar-subquery#n` instead
    * of a megabyte hex literal. */
  def mightContainSubquery(buildKeys: DataFrame, buildKeyCol: Column,
                           probeKeyCol: Column,
                           expectedItems: Long, numBits: Long): Column = {
    val agg = Bridge.column(new BloomFilterAggregate(
      Bridge.expression(buildKeyCol),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val sub = buildKeys.select(agg.as("bf")).queryExecution.analyzed
    Bridge.column(BloomFilterMightContain(
      ScalarSubquery(sub), Bridge.expression(probeKeyCol)))
  }

  /** Which train docs share ≥ `minShared` distinct shingles with the
    * eval set? Output (t_id, n_shared), exact. The train shingle stream
    * is bloom-pruned in its scan stage before the confirm join.
    *
    * vs [[Dedup.contaminationReport]] (per eval-doc pair counts, df-cap
    * needed to bound the pair blow-up): here the eval side is collapsed
    * to ONE distinct shingle set, so the join is linear in surviving
    * train shingles — no pair semantics, no df cap.
    */
  def contaminatedTrainDocs(evalDocs: DataFrame, trainDocs: DataFrame,
                            idCol: Column, text: Column, shingleN: Int,
                            minShared: Int,
                            expectedItems: Long = 1L << 18,
                            numBits: Long = 1L << 22): DataFrame = {
    val evalSh = Dedup.shingleSets(evalDocs, idCol, text, shingleN)
      .select(explode(col("shset")).as("h")).distinct()
    val trainSh = Dedup.shingleSets(trainDocs, idCol, text, shingleN)
      .select(col("doc_id").as("t_id"), explode(col("shset")).as("h"))
      .where(mightContainSubquery(evalSh, col("h"), col("h"),
        expectedItems, numBits))
    trainSh.join(evalSh, "h")
      .groupBy(col("t_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
