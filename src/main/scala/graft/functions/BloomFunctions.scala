package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions.lit
import org.apache.spark.util.sketch.BloomFilter

/** Column-side membership probes of a driver-built Bloom sketch.
  *
  * Spark ships [[BloomFilterMightContain]] — the codegen'd expression
  * its own runtime row-level join filters inject — but does not
  * register it (or `bloom_filter_agg`) in the public SQL function
  * registry as of 4.1 (probed: `DESCRIBE FUNCTION might_contain` →
  * UNRESOLVED_ROUTINE), so the Column API constructs the expression
  * directly: the sketch serializes once into a binary literal (the
  * same bytes a broadcast would carry; `deserialize` is lazy-cached
  * inside the expression per executor) and every probe is compiled
  * code — the last two `udf(...)` sites in the engine fall to this. */
object BloomFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** `might_contain(bloom, value)` — value must be a LONG hash column
    * (the sketch must have been built over longs). Null value → null,
    * matching the SQL expression's semantics. */
  def mightContain(bloom: BloomFilter, value: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    column(BloomFilterMightContain(
      expression(lit(bos.toByteArray)), expression(value)))
  }
}
