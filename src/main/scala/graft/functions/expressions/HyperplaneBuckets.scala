package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd random-hyperplane LSH signature: ALL table buckets in
  * one fused loop per row. `planes(t)(b)` is the dim-length hyperplane for
  * bit `b` of table `t`; the output is an `array<long>` with one
  * `bitsPerTable`-bit bucket per table.
  *
  * Replaces tables x bits interpreted `aggregate(zip_with(...))` folds
  * (higher-order functions are CodegenFallback — the dominant per-row
  * cost of the internal-LSH embedding near-dup path at scale). Bit
  * semantics match the composed `Vectors.hyperplaneBit` form exactly:
  * bit b set iff the left-to-right double dot product >= 0, bucket =
  * sum(bit << b) — and the same fold the oracle replays via
  * `list_reduce`, so gate results are unchanged.
  *
  * Null contract: a null vector, a null element, or a length != dim
  * yields NULL (the composed form nulls each bucket through null-padded
  * `zip_with` folds; collapsing that to one null array is equivalent
  * downstream — bucket-join keys drop nulls either way). */
case class HyperplaneBuckets(child: Expression,
    planes: Seq[Seq[Seq[Double]]]) extends UnaryExpression {

  private val tables = planes.length
  private val bits = planes.head.length
  private val dim = planes.head.head.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float|double> input, got ${other.sql}")
    }

  private def elemType = child.dataType.asInstanceOf[ArrayType].elementType

  /** Row-major (table, bit, dim) plane coefficients — one flat array so
    * codegen indexes with a running offset instead of nested objects. */
  @transient private lazy val flat: Array[Double] =
    planes.flatten.flatten.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val t = elemType
    val xs = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      xs(j) = t match {
        case FloatType  => v.getFloat(j).toDouble
        case DoubleType => v.getDouble(j)
      }
      j += 1
    }
    val out = new Array[Long](tables)
    var p = 0
    var ti = 0
    while (ti < tables) {
      var bkt = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += xs(i) * flat(p + i); i += 1 }
        if (dot >= 0.0) bkt |= (1L << b)
        p += dim
        b += 1
      }
      out(ti) = bkt
      ti += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("hyperplanes", flat, "double[]")
      val getter = elemType match {
        case FloatType  => (i: String) => s"(double) $v.getFloat($i)"
        case DoubleType => (i: String) => s"$v.getDouble($i)"
      }
      val xs = ctx.freshName("xs"); val out = ctx.freshName("out")
      val p = ctx.freshName("p"); val t = ctx.freshName("t")
      val b = ctx.freshName("b"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val dot = ctx.freshName("dot")
      val bkt = ctx.freshName("bkt")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $xs = new double[$dim];
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($v.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    $xs[$j] = ${getter(j)};
         |  }
         |  if (!${ev.isNull}) {
         |    long[] $out = new long[$tables];
         |    int $p = 0;
         |    for (int $t = 0; $t < $tables; $t++) {
         |      long $bkt = 0L;
         |      for (int $b = 0; $b < $bits; $b++) {
         |        double $dot = 0.0;
         |        for (int $i = 0; $i < $dim; $i++) {
         |          $dot += $xs[$i] * $planesRef[$p + $i];
         |        }
         |        if ($dot >= 0.0) $bkt |= (1L << $b);
         |        $p += $dim;
         |      }
         |      $out[$t] = $bkt;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** All hyperplane-table buckets for `v` as one `array<long>` column. */
  def bucketsNative(v: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    Shims.column(HyperplaneBuckets(Shims.expression(v), planes))
}
