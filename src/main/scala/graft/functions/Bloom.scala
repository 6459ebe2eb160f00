package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge

/** In-plan Bloom-filter build + probe over Spark's native sketch
  * expressions (`BloomFilterAggregate` / `BloomFilterMightContain` — the
  * machinery behind Spark's injected runtime filters, exposed here as a
  * deliberate operator).
  *
  * The build is a real distributed aggregate: per-partition filters merge
  * map-side (TypedImperativeAggregate), so ONE pass over the build side
  * yields one binary sketch regardless of scale. The probe side references
  * that 1-row aggregate as an uncorrelated scalar subquery — Spark
  * executes the subquery once and injects the result as a runtime
  * constant, which is exactly what `might_contain` requires (it rejects
  * arbitrary attribute inputs). No driver-side collect anywhere.
  *
  * Use case: pre-prune a huge probe side before an expensive shuffle join
  * when the join is followed by an exact verify anyway — false positives
  * only cost a little extra join work, never correctness.
  */
object Bloom {

  /** Aggregate column: build a Bloom filter over `h` (must be LongType —
    * hash first, e.g. `xxhash64`). `expectedItems`/`numBits` size the
    * sketch: ~8 bits/item gives ~2% false positives.
    */
  def bloomAgg(h: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      Bridge.expression(h), Literal(expectedItems), Literal(numBits))
      .toAggregateExpression())

  /** Predicate: `h` (LongType) might be in the filter built by `bloomDf`
    * (a 1-row, 1-binary-column aggregate, referenced as a scalar
    * subquery). False positives possible; false negatives never.
    */
  def mightContain(bloomDf: DataFrame, h: Column): Column =
    Bridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      Bridge.expression(h)))

  /** Predicate over a pre-built sketch carried as a literal — the shape
    * for STREAMING probes, where the filter is a broadcast artifact built
    * once per corpus snapshot (scalar subqueries re-execute per
    * micro-batch plan; a literal does not).
    */
  def mightContainLit(bloomBytes: Array[Byte], h: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloomBytes), Bridge.expression(h)))
}
