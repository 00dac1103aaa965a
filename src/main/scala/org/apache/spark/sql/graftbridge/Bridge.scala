package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.{DataFrame => SqlDataFrame}

/** Column ↔ Expression bridge. Spark 4 made `ExpressionUtils`
  * `private[sql]`; living in an `org.apache.spark.sql` subpackage is the
  * sanctioned extension-library route to it (no internals are modified —
  * this only re-exports the two converters custom Expressions need). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-declare a checkpointed DataFrame's hash partitioning on its
    * `LogicalRDD` leaf. `Dataset.checkpoint`/`localCheckpoint` under
    * Spark 4 publishes `UnknownPartitioning` (measured: even an explicit
    * `repartition(n, key)` immediately upstream is erased), so every
    * later join/aggregate on the SAME key re-shuffles rows that are
    * already laid out correctly. This helper restores the metadata the
    * physical layout already satisfies — it changes NO rows and NO
    * placement, only what the planner is allowed to assume.
    *
    * TRUTHFULNESS CONTRACT (caller's burden): the checkpointed plan must
    * end in `repartition(numPartitions, cols...)` — an explicit count,
    * which AQE never coalesces — so that rows genuinely sit at
    * `murmur3(cols) % numPartitions`. Declaring a layout the RDD does
    * not have silently co-locates nothing and yields WRONG JOINS. Keep
    * every call site next to its repartition (see
    * [[graft.operators.DedupOps.IterState]] `pinPartitioned`).
    *
    * Returns `df` unchanged when its analyzed plan is not a bare
    * `LogicalRDD` leaf (e.g. an Unpinned no-op pin, where the
    * repartition node itself still advertises the partitioning). */
  def declareHashPartitioning(df: SqlDataFrame, cols: Seq[String],
                              numPartitions: Int): SqlDataFrame =
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val attrs = cols.map { c =>
          l.output.find(_.name == c).getOrElse(
            throw new IllegalArgumentException(
              s"declareHashPartitioning: no column '$c' in ${l.output}"))
        }
        val session =
          df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val relabeled = LogicalRDD(l.output, l.rdd,
          HashPartitioning(attrs, numPartitions), l.outputOrdering,
          l.isStreaming, l.stream)(session)
        org.apache.spark.sql.classic.Dataset.ofRows(session, relabeled)
      case _ => df
    }
}
