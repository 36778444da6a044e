package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed cumulative count — the 100 TB path for q09's running total.
  *
  * `count(*) OVER (ORDER BY …)` forces every row through ONE task (Spark
  * warns "No Partition Defined for Window operation"); fine at sf0.1,
  * impossible at 100 TB. The scalable shape is the classic two-pass prefix
  * sum:
  *   1. range-partition + sort by the total order (shuffle, parallel);
  *      persist so the sampled range boundaries are pinned across jobs —
  *      re-executing `repartitionByRange` resamples and would misalign the
  *      offset pass with the data pass;
  *   2. count rows per partition (a metadata-sized job: ≤ #partitions
  *      numbers to the driver — the same scale of driver traffic AQE uses);
  *   3. per-partition scan adds (exclusive prefix offset + local index).
  *
  * Output is identical to the window-function formulation by construction
  * (the order (ts, event_id) is total); [[graft.CumulativeSpec]] pins
  * equality row-for-row.
  */
object Cumulative {

  /** Cumulative count over the total order (ts, event_id); returns
    * (event_id, ts, running_cnt). */
  def runningCount(spark: SparkSession, events: DataFrame, partitions: Int = 0): DataFrame = {
    val p = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = events.select(col("event_id"), col("ts"))
      .repartitionByRange(p, col("ts"), col("event_id"))
      .sortWithinPartitions("ts", "event_id")
      .persist() // pin sampled range boundaries across the two passes
    val perPartition = parted
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until p).scanLeft(0L) {
      case (acc, pid) => acc + perPartition.getOrElse(pid, 0L)
    }.toArray // exclusive prefix: offsets(pid) = rows before partition pid
    val outSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType),
      StructField("running_cnt", LongType)))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    parted.mapPartitions { it =>
      val base = offsets(TaskContext.getPartitionId())
      var i = 0L
      it.map { r =>
        i += 1
        Row(r.getLong(0), r.getAs[java.time.LocalDateTime](1), base + i)
      }
    }
  }
}
