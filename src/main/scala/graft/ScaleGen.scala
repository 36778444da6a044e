package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of the driver's synthetic tables (VERDICT
  * r14 #1 — the empirical scale probe). Usage:
  *
  *   runMain graft.ScaleGen [srcDir] [dstDir] [copies]
  *   (defaults: /root/testdata/sf0.1  scale/sf1  10)
  *
  * Method: each fact table is unioned `copies` times with copy-local key
  * offsets (stride = max key + 1), so every copy joins WITHIN itself and
  * per-key group sizes stay constant while global cardinality scales —
  * the TPC-H scaling discipline. The similarity families get the same
  * treatment at the CONTENT level, or replication would manufacture a
  * quadratic blow-up the real corpus doesn't have:
  *
  *  - `documents.text` tokens are suffixed `_c` per copy c>0 — token
  *    counts, doc lengths, TF shape and shingle structure are preserved
  *    within a copy, while cross-copy Jaccard/SimHash similarity is zero
  *    by construction (near-dup pair counts scale ~linearly, vocabulary
  *    scales ~N×, both as a real crawl would);
  *  - `embeddings.embedding` dimensions are sign-flipped by a per-copy
  *    deterministic ±1 mask — norms and all WITHIN-copy cosines are
  *    bit-preserved, cross-copy cosines decorrelate (ANN cell structure
  *    replicates instead of collapsing into one dense twin cluster).
  *
  * Dimension tables (region, nation) stay fixed, like TPC-H. Copy 0 is
  * the source rows unchanged. Everything is derived from (row, copy) —
  * no RNG, so the output is reproducible bit for bit.
  *
  * The output lands under the repo's own `scale/` dir (gitignored);
  * `/root/testdata` is never written.
  */
object ScaleGen {

  private def stride(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head().getLong(0) + 1L

  /** Union `copies` key-shifted copies of `df`; `shift` builds copy c. */
  private def replicate(df: DataFrame, copies: Int)(
      shift: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until copies).map(c => shift(df, c)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("scale/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Engine.localSession("graft-scalegen")

    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")

    // dimensions: fixed, copied once
    write(spark.read.parquet(s"$src/region.parquet"), "region", 1)
    write(spark.read.parquet(s"$src/nation.parquet"), "nation", 1)

    val customer = spark.read.parquet(s"$src/customer.parquet")
    val kCust = stride(customer, "c_custkey")
    write(replicate(customer, copies) { (d, c) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(c * kCust))
        .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
    }, "customer", 4)

    val supplier = spark.read.parquet(s"$src/supplier.parquet")
    val kSupp = stride(supplier, "s_suppkey")
    write(replicate(supplier, copies) { (d, c) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(c * kSupp))
        .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey")))
    }, "supplier", 2)

    val part = spark.read.parquet(s"$src/part.parquet")
    val kPart = stride(part, "p_partkey")
    write(replicate(part, copies) { (d, c) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(c * kPart))
    }, "part", 4)

    val orders = spark.read.parquet(s"$src/orders.parquet")
    val kOrd = stride(orders, "o_orderkey")
    write(replicate(orders, copies) { (d, c) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(c * kOrd))
        .withColumn("o_custkey", col("o_custkey") + lit(c * kCust))
    }, "orders", 8)

    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    write(replicate(lineitem, copies) { (d, c) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(c * kOrd))
        .withColumn("l_partkey", col("l_partkey") + lit(c * kPart))
        .withColumn("l_suppkey", col("l_suppkey") + lit(c * kSupp))
    }, "lineitem", 32)

    val events = spark.read.parquet(s"$src/events.parquet")
    val kEv = stride(events, "event_id")
    val kUser = stride(events, "user_id")
    write(replicate(events, copies) { (d, c) =>
      // same time range at N× the rate — window/state sizing scales with
      // key × time, which is exactly what the probe should stress
      d.withColumn("event_id", col("event_id") + lit(c * kEv))
        .withColumn("user_id", col("user_id") + lit(c * kUser))
    }, "events", 16)

    val documents = spark.read.parquet(s"$src/documents.parquet")
    val kDoc = stride(documents, "doc_id")
    write(replicate(documents, copies) { (d, c) =>
      val txt = if (c == 0) col("text")
        else concat_ws(" ", transform(split(col("text"), " "),
          t => when(t === "", t).otherwise(concat(t, lit(s"_$c")))))
      d.withColumn("doc_id", col("doc_id") + lit(c * kDoc))
        .withColumn("text", txt)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents", 8)

    val embeddings = spark.read.parquet(s"$src/embeddings.parquet")
    val kVec = stride(embeddings, "vec_id")
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    write(replicate(embeddings, copies) { (d, c) =>
      val emb = if (c == 0) col("embedding")
        else {
          // per-copy ±1 mask from a Knuth-hash of (copy, dim index):
          // norms and within-copy cosines are preserved exactly
          val mask = (0 until dim).map(i =>
            if ((((i.toLong * 2654435761L + c * 40503L) >>> 7) & 1L) == 0L) 1.0f
            else -1.0f)
          zip_with(col("embedding"),
            array(mask.map(lit): _*),
            (x, s) => (x * s).cast("float"))
        }
      d.withColumn("vec_id", col("vec_id") + lit(c * kVec))
        .withColumn("embedding", emb)
    }, "embeddings", 4)

    println(s"""{"scale_gen":"done","src":"$src","dst":"$dst","copies":$copies}""")
    spark.stop()
  }
}
