package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The classic Jaro–Winkler algorithm (Winkler 1990): Jaro similarity
  * with match window `max(|s1|,|s2|)/2 − 1`, transpositions counted as
  * the FLOOR of half the out-of-order matches (strcmp95), and the
  * Winkler prefix boost
  * `jaro + ℓ·0.1·(1−jaro)` applied only when jaro > 0.7, prefix length
  * capped at 4 — exactly the variant DuckDB's builtin
  * `jaro_winkler_similarity` implements (probed: MARTHA/MARHTA →
  * 0.9611…, DIXON/DICKSONX → 0.8133…, boost suppressed at jaro ≤ 0.7,
  * either-empty → 0.0), which is what lets [[JaroWinkler]] be
  * oracle-checked against it. Operates on UTF-16 chars — identical to
  * byte/codepoint variants on ASCII/BMP text, the fixture and the
  * typical entity-resolution domain.
  *
  * A separate object (not the Expression) so the generated code calls
  * ONE static-dispatch method — the same shape as Spark's own
  * `levenshtein`, which bottoms out in a `UTF8String` helper. */
object JaroWinklerAlgo {

  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk matched chars of both strings in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // FLOORED half-transpositions (t/2 integer division) — the original
    // strcmp95 convention DuckDB implements; the fractional t/2.0
    // variant diverges on odd mismatch counts ("red gear"/"large gear":
    // 3 mismatches → 0.7869 fractional vs DuckDB's 0.8107) — verified
    // bitwise-equal to the oracle builtin on all 80,140 fixture pairs
    val jaro = (md / l1 + md / l2 + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** Codegen'd Jaro–Winkler similarity over string columns — the fuzzy
  * name-matching scorer ([[graft.operators.Dedup.fuzzyPairs]]'s
  * graded sibling: Levenshtein gates on an edit budget, Jaro–Winkler
  * ranks by prefix-weighted similarity, the record-linkage standard).
  * A native Catalyst `Expression` keeps the blocked pair pipeline
  * (join → score → threshold) inside whole-stage codegen: the
  * generated code is one static call per row, no UDF ser/de. Null in →
  * null out (BinaryExpression's default null-safety). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires string inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerAlgo.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the string expressions (the [[Vectors]]
  * pattern: plan-bridge wrapping, no session extension required). */
object StringFns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
