package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Jaro-Winkler similarity — the bounded-window fuzzy
  * NAME matcher (record linkage on person/place/org names, where
  * Levenshtein over-penalizes transpositions). Sixth native Expression
  * per the SURVEY §2.9 escalation rule: Spark has no built-in, a UDF
  * would serialize per row, and the match-window loops belong in one
  * fused Java method.
  *
  * Semantics pinned to the classic definition as implemented by DuckDB
  * (verified empirically, gate-differential): byte-level comparison,
  * match window floor(max/2)-1, half-transpositions, Winkler prefix
  * boost (scale 0.1, prefix capped at 4) applied only when jaro > 0.7,
  * and 0.0 when either side is empty (DuckDB returns 0 for
  * empty-vs-empty; so do we). Byte-level means non-ASCII multi-byte
  * runes compare per byte — identical to DuckDB, documented here.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerImpl.score(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.JaroWinklerImpl" +
        s".score($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def jaroWinklerNative(a: Column, b: Column): Column =
    Shims.column(JaroWinkler(Shims.expression(a), Shims.expression(b)))
}

/** The scoring core, in its own object so Scala emits a static forwarder
  * the generated Java can call directly (one method call per row; the
  * loops JIT as tight byte-array scans). */
object JaroWinklerImpl {

  /** Per-thread match-flag scratch, reused across calls: a similarity
    * JOIN evaluates this kernel millions of times per task, and two
    * fresh boolean arrays per call were measurable GC churn. The arrays
    * only grow; flags are reset per call over the used prefix. */
  private val scratch = new ThreadLocal[(Array[Boolean], Array[Boolean])] {
    override def initialValue(): (Array[Boolean], Array[Boolean]) =
      (new Array[Boolean](64), new Array[Boolean](64))
  }

  /** Test/utility overload on raw bytes. */
  def score(a: Array[Byte], b: Array[Byte]): Double =
    score(UTF8String.fromBytes(a), UTF8String.fromBytes(b))

  /** Zero-copy scoring path: reads bytes straight out of the
    * UnsafeRow-backed UTF8Strings (no getBytes materialization). */
  def score(a: UTF8String, b: UTF8String): Double = {
    val la = a.numBytes(); val lb = b.numBytes()
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    var s = scratch.get()
    if (s._1.length < la || s._2.length < lb) {
      val n = math.max(math.max(la, lb), s._1.length * 2)
      s = (new Array[Boolean](n), new Array[Boolean](n))
      scratch.set(s)
    }
    val aM = s._1; val bM = s._2
    java.util.Arrays.fill(aM, 0, la, false)
    java.util.Arrays.fill(bM, 0, lb, false)
    var m = 0
    var i = 0
    while (i < la) {
      val ai = a.getByte(i)
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && ai == b.getByte(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) t += 1
        k += 1
      }
      i += 1
    }
    // integer floor-halving, NOT t/2.0: the classic definition (and
    // DuckDB's implementation) counts transpositions as floor(raw/2) —
    // a fractional half diverges whenever the raw mismatch count is odd
    // (caught by the q_join_jw differential on 27/29-char titles)
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val maxL = math.min(4, math.min(la, lb))
      while (l < maxL && a.getByte(l) == b.getByte(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
