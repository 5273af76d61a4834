package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 (robots.txt) path-pattern matcher: anchored-at-start
  * prefix match with `*` (any char run, greedy-with-backtracking) and
  * an optional trailing `$` (end anchor). Runs per (url, rule) pair
  * AFTER the frontier×rules join, so it must be codegen — one static
  * call per row, no UDF closure (house preference order, SURVEY
  * §2.11). The match-length precedence (longest pattern wins, Allow
  * wins ties) is plain column algebra downstream. */
object RobotsMatchHelper {
  /** Iterative glob match: pattern chars must match from path START;
    * a pattern exhausted before the path is a PREFIX match unless it
    * ends `$`. Two-pointer with single-star backtracking — linear in
    * practice, never recursive. */
  def matches(path: UTF8String, pattern: UTF8String): Boolean = {
    val s = path.toString
    var p = pattern.toString
    var anchored = false
    if (p.nonEmpty && p.charAt(p.length - 1) == '$') {
      anchored = true; p = p.substring(0, p.length - 1)
    }
    var si = 0; var pi = 0
    var starPi = -1; var starSi = -1
    while (si < s.length) {
      // prefix semantics FIRST: the moment the whole (unanchored)
      // pattern is consumed, it matches — never backtrack past it
      if (pi == p.length && !anchored) return true
      if (pi < p.length && (p.charAt(pi) == s.charAt(si))) { si += 1; pi += 1 }
      else if (pi < p.length && p.charAt(pi) == '*') {
        starPi = pi; pi += 1; starSi = si
      } else if (starPi >= 0) { // backtrack: the star eats one more char
        pi = starPi + 1; starSi += 1; si = starSi
      } else return false // mismatch, or anchored-exhausted, no star
    }
    // path exhausted: remaining pattern chars must all be '*'
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length // anchored or not, a full consume at path end matches
  }
}

/** `robots_match(path, pattern) → boolean`; null if either side is. */
case class RobotsMatch(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_match"
  override protected def nullSafeEval(path: Any, pattern: Any): Any =
    RobotsMatchHelper.matches(path.asInstanceOf[UTF8String],
      pattern.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, q) =>
      s"graft.functions.RobotsMatchHelper.matches($p, $q)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsMatch =
    copy(left = newLeft, right = newRight)
}

object RobotsFns {
  def robotsMatch(path: Column, pattern: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(RobotsMatch(
      org.apache.spark.sql.graft.Bridge.expression(path),
      org.apache.spark.sql.graft.Bridge.expression(pattern)))
}
