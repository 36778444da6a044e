package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over the embeddings table — the
  * shared engine behind the single-probe declared queries (q29 hyperplane
  * LSH, q43 IVF) and their MULTI-PROBE variants (q61, q62).
  *
  * Single-probe ANN's recall is whatever fraction of true neighbors lands
  * in the query's own bucket/cell — measured at sf0.01 it is 0.3 (LSH) and
  * 0.1 (IVF) against the exact q24 top-10. Multi-probe is the standard
  * remedy (Lv et al., "Multi-Probe LSH", VLDB'07; IVF nprobe in the
  * FAISS/IVFADC lineage): also scan the buckets MOST LIKELY to hold
  * spill-over neighbors —
  *  - LSH: the query bucket plus the 4 Hamming-distance-1 buckets (one
  *    hyperplane sign flipped): 5 of 16 buckets, recall 0.9 at sf0.01;
  *  - IVF: the `nprobe` nearest centroids instead of 1: nprobe=4 gives
  *    recall 0.7 at sf0.01 (the fixture's cells are its class labels, not
  *    geometric k-means cells, so neighbors spread wide; AnnRecallSpec
  *    pins the measured floors).
  *
  * Scale posture: recall/cost tunes by ADDING planes/centroids while
  * probing a fixed count — 16 planes → 65k buckets with 17 probed is
  * 0.03 % of the corpus; 4096 IVF cells with nprobe=64 is 1.6 %. The probe
  * set is always a tiny broadcast (the centroid table is O(cells·dim));
  * the corpus side stays a single filtered scan with one codegen'd
  * `graft_dot` per surviving row, and the top-k is per-partition heaps
  * (TakeOrderedAndProject), never a global sort.
  */
object Ann {

  private def dot(x: Column, y: Column) = call_function("graft_dot", x, y)
  private def cosine(x: Column, y: Column) =
    dot(x, y) / (sqrt(dot(x, x)) * sqrt(dot(y, y)))

  /** Hyperplane-LSH top-10 for vec_id 0: 4 deterministic integer-lattice
    * hyperplanes → 4-bit sign bucket; candidates are the query's bucket,
    * plus its 4 flip-1-bit buckets when `multiProbe` (q61); exact cosine
    * ranks the survivors. */
  def lshTopK(s: SparkSession, dir: String, multiProbe: Boolean): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    val v = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val planes = s.range(4).select(col("id").as("p"))
      .withColumn("r", transform(sequence(lit(0), lit(63)),
        j => (((col("p") + 1) * lit(2654435761L) + (j + 1) * lit(40503L)) % 1009 - 504)
          .cast("double")))
    val bkt = v.crossJoin(broadcast(planes))
      .withColumn("bit", when(dot(col("e"), col("r")) >= 0, 1L).otherwise(0L))
      .groupBy("vec_id")
      .agg(sum(expr("bit * shiftleft(cast(1 as bigint), p)")).as("bucket"))
    val vb = v.join(bkt, "vec_id")
    val q = vb.filter(col("vec_id") === 0).select(col("e").as("qv"), col("bucket").as("qb"))
    // the probe set as a codegen'd predicate over the broadcast 1-row query:
    // exact bucket, or (multi-probe) Hamming distance 1 from it
    val probed =
      if (multiProbe)
        ((col("bucket") === col("qb")) +: (0 until 4).map(p =>
          col("bucket") === col("qb").bitwiseXOR(lit(1L << p)))).reduce(_ || _)
      else col("bucket") === col("qb")
    vb.join(broadcast(q))
      .filter(probed && col("vec_id") =!= 0)
      .withColumn("cos", cosine(col("e"), col("qv")))
      .select(col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(10)
  }

  /** IVF top-10 for vec_id 0: per-cell centroids (the fixture's `label`
    * column as the cell assignment), rank cells by query-centroid cosine,
    * scan the `nprobe` best (q43 is nprobe=1, q62 is nprobe=4), exact
    * cosine ranks the survivors. Centroid components round to 6 dp so both
    * engines rank identical centroids. */
  def ivfTopK(s: SparkSession, dir: String, nprobe: Int): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))
    val cent = emb
      .select(col("label"), posexplode(col("e")).as(Seq("j", "v")))
      .groupBy("label", "j").agg(round(avg(col("v")), 6).as("av"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("av")))),
        x => x.getField("av")).as("c"))
    val q0 = emb.filter(col("vec_id") === 0).select(col("e").as("qv"))
    val best = cent.join(broadcast(q0))
      .orderBy(cosine(col("c"), col("qv")).desc, col("label").asc)
      .limit(nprobe).select("label")
    emb.join(broadcast(best), "label")
      .join(broadcast(q0))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), round(cosine(col("e"), col("qv")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(10)
  }

  /** Symmetric per-vector int8 quantization — the STORAGE side of the ANN
    * family: `code_i = round(127 · v_i / max|v|)` shrinks the vector store
    * 4× (ARRAY<TINYINT> vs ARRAY<FLOAT>), and because cosine is
    * scale-invariant PER VECTOR, ranking by cosine over the codes is the
    * exact ranking over the originals up to the int rounding — no
    * per-dimension stats table, no calibration pass, each row quantizes
    * independently (stream-safe). AnnRecallSpec pins the recall floor of
    * a brute-force top-10 over codes vs the exact q24. The all-zero
    * vector codes to all-zero. Engine-side only (not oracle-declared:
    * round-half-up on DOUBLE is not specified identically across
    * engines). Planned as the native [[graft.expressions.QuantizeInt8]]
    * — a declarative `transform`-referencing-`aggregate` form would
    * re-evaluate the max-abs pass per ELEMENT (O(d²) interpreted steps
    * per row; higher-order functions are CodegenFallback). */
  def quantizeInt8(vec: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.expressions.QuantizeInt8(org.apache.spark.sql.GraftSqlBridge.expression(vec)))

  /** Codes back to DOUBLE in [−1, 1] (the per-vector scale cancels in any
    * cosine, so `code/127` is all a similarity query needs). */
  def dequantize(codes: Column): Column =
    transform(codes, c => c.cast("double") / 127.0)
}
