package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{MisraGriesAgg, ModeCount, MomentMatrixAgg, PcmEnergies, ShingleHashes, SimHash32, Sum128, VecDot}

/** `SparkSessionExtensions` installer for graft's native SQL surface.
  *
  * Wire up with either
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  * or `--conf spark.sql.extensions=graft.GraftExtensions` — the latter
  * works on a cluster where the session builder is not under our
  * control. Registration makes the native expressions callable from
  * `spark.sql` / `expr(...)` text, not just the Column API in
  * [[graft.functions.VecFns]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL MERGE INTO for graft-lake tables (r14): rewrites a resolved
    // MergeIntoTable over a LakeTable into the command that routes
    // through LakeMaintenance.merge — Spark's own row-level rewrite
    // requires SupportsRowLevelOperations and would reject it
    ext.injectResolutionRule(session =>
      graft.plans.LakeMergeRule(session))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"vec_dot expects 2 arguments, got ${args.length}")
        VecDot(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"simhash32 expects 1 argument, got ${args.length}")
        SimHash32(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("mode_count"),
      new ExpressionInfo(classOf[ModeCount].getName, "mode_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"mode_count expects 1 argument, got ${args.length}")
        ModeCount(args.head)
      }))
    // aggregate functions registered this way are wrapped in an
    // AggregateExpression by the analyzer, same as built-in aggregates
    ext.injectFunction((
      new FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"misra_gries expects (key, capacity), got ${args.length} arguments")
        require(args(1).foldable, "misra_gries capacity must be a literal")
        MisraGriesAgg(args.head,
          args(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("moment_matrix"),
      new ExpressionInfo(classOf[MomentMatrixAgg].getName, "moment_matrix"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"moment_matrix expects (embedding, dim), got ${args.length} arguments")
        require(args(1).foldable, "moment_matrix dim must be a literal")
        MomentMatrixAgg(args.head,
          args(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("pcm_energies"),
      new ExpressionInfo(classOf[PcmEnergies].getName, "pcm_energies"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"pcm_energies expects (payload, window_samples), got ${args.length} arguments")
        require(args(1).foldable, "pcm_energies window must be a literal")
        PcmEnergies(args.head, args(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"shingle_hashes expects (tokens, n, mod), got ${args.length} arguments")
        require(args(1).foldable && args(2).foldable,
          "shingle_hashes n and mod must be literals")
        ShingleHashes(args.head,
          args(1).eval().asInstanceOf[Number].intValue(),
          args(2).eval().asInstanceOf[Number].longValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("sum128"),
      new ExpressionInfo(classOf[Sum128].getName, "sum128"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"sum128 expects (unscaled_long, scale), got ${args.length} arguments")
        require(args(1).foldable, "sum128 scale must be a literal")
        Sum128(args.head, args(1).eval().asInstanceOf[Number].intValue())
      }))
  }
}
