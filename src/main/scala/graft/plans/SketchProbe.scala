package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe.
  *
  * A driver-built [[org.apache.spark.util.sketch.BloomFilter]] serializes
  * into a binary literal child of Spark's own
  * `BloomFilterMightContain` expression — the exact machinery Catalyst's
  * `InjectRuntimeFilter` rule uses for its runtime bloom joins. Each task
  * deserializes the filter once (lazy, inside the generated class) and the
  * per-row probe is a straight `mightContainLong` call inside the
  * surrounding whole-stage-codegen span. Replaces the previous
  * `udf(mightContainLong)` wrapper, which was opaque to codegen and
  * blocked expression pushdown on the hottest row path of the
  * incremental-dedup and runtime-filter joins.
  */
object SketchProbe {

  /** `value` must be LongType (the xxhash64 key the filter was built on). */
  def bloomMightContain(bf: BloomFilter, value: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    GraftSqlShim.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType), GraftSqlShim.expression(value)))
  }
}
