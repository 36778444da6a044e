package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Demonstration typed `Aggregator[IN, BUF, OUT]` — the 1:1 mirror of the
  * reference's `CustomSumAggregator` (`/root/reference` Main.java:358-383:
  * createAccumulator/add/getResult/merge over Long counts). SURVEY.md §4.3
  * item 2: capability proof for the typed-UDAF API path; built-in `sum` is
  * the production choice (identical partial+final plan, codegen'd).
  *
  * `merge` is the contract that makes it scale: Catalyst runs `reduce`
  * map-side per partition and `merge` after the shuffle — exactly Flink's
  * pre-aggregation, chosen automatically.
  */
object TypedSum extends Aggregator[Long, Long, Long] {
  override def zero: Long = 0L                          // createAccumulator
  override def reduce(b: Long, a: Long): Long = b + a   // add
  override def merge(b1: Long, b2: Long): Long = b1 + b2
  override def finish(r: Long): Long = r                // getResult
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
