package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's native bloom-filter expressions — the
  * machinery behind Catalyst's own InjectRuntimeFilter, exposed for
  * operators that want an EXPLICIT membership prefilter (e.g. benchmark
  * decontamination, where the filter side is a fixed corpus known up
  * front rather than a join build side the optimizer discovers).
  *
  * Both sides are codegen-capable catalyst expressions — no UDF, no
  * driver-side probe loop; `mightContain` compiles to a bit-probe per
  * row inside whole-stage codegen. */
object Sketch {

  /** Aggregate a LONG hash column into one serialized bloom-filter blob
    * (binary). `numBits` fixes the false-positive regime explicitly:
    * fp ~ 0.62^(numBits/items) for the default k; size the blob at
    * numBits/8 bytes however many items feed it. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    Shims.column(new BloomFilterAggregate(Shims.catalystExpression(c),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe a serialized bloom blob with a LONG hash column. May return
    * false positives (rate set at build time), never false negatives —
    * callers keep an exact verify stage behind it. */
  def bloomMightContain(blob: Array[Byte], c: Column): Column =
    Shims.column(BloomFilterMightContain(Literal(blob, BinaryType),
      Shims.catalystExpression(c)))
}
